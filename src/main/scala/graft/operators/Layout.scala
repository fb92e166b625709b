package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout keys for write-side data clustering. */
object Layout {

  /** Export a corpus as DETERMINISTIC JSONL training shards — the
    * terminal stage of a curation pipeline (trainers consume
    * newline-delimited JSON shards, not parquet): every row becomes
    * one JSON line (`to_json` of the full row struct, schema order),
    * rows land in `numShards` shards by the md5 of `idCol` and are
    * ordered INSIDE each shard by that same hash — the
    * [[Sampling.shuffleOrder]] discipline, so the byte content of
    * every shard is a pure function of the data: re-exports diff
    * clean, resumed jobs overwrite identically, and two clusters
    * produce the same artifact.
    *
    * Layout: `outDir/shard=N/part-*.txt[.gz]`. Scale shape: one
    * shuffle (repartition on the shard id), a within-partition sort,
    * one file per (task, shard) — shard count IS the writer
    * parallelism, so size `numShards` to the trainer's reader count
    * (the shuffleOrder sizing rule). `compression = "gzip"` for the
    * classic jsonl.gz feed; None for plain text.
    */
  def exportJsonl(df: DataFrame, idCol: String, outDir: String,
                  numShards: Int, compression: Option[String] = None): Unit = {
    require(numShards >= 1, s"numShards must be positive, got $numShards")
    val keyed = df
      .withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("shard",
        pmod(conv(substring(col("__h"), 1, 15), 16, 10).cast("long"),
          lit(numShards.toLong)))
    val lines = keyed
      .withColumn("line", to_json(struct(df.columns.toIndexedSeq.map(col): _*)))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__h"), col(idCol))
      .select(col("line"), col("shard"))
    val w = lines.write.mode("overwrite").partitionBy("shard")
    compression.fold(w)(c => w.option("compression", c)).text(outDir)
  }

  /** Schema-PINNED read-back of an [[exportJsonl]] corpus: the reader
    * side of the jsonl.gz interchange contract. The schema is passed,
    * never inferred — inference is a full extra scan (at 100 TB the
    * single most expensive default in `spark.read.json`) and can
    * widen/narrow types between shards; FAILFAST surfaces a corrupt
    * line as an error instead of a silent null row (the PERMISSIVE
    * default quietly nulls whole records). Shard partition directories
    * come back as a `shard` column via partition discovery.
    */
  def readJsonl(spark: org.apache.spark.sql.SparkSession, dir: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(dir)

  /** Plan a small-file COMPACTION: assign input files to target-sized
    * output bins by cumulative fill in size-descending order
    * (deterministic file-id tiebreak), optionally within table
    * partitions. `bin = (running total BEFORE this file) div target`
    * — Spark's own file-coalescing strategy writ relational: every
    * bin fills to ≥ target before the next opens (overshoot bounded
    * by one file), and a file larger than target lands in a bin of
    * its own.
    *
    * The PLANNING complement of [[compact]]: `compact` rewrites a
    * whole directory through one repartition (right for a one-shot
    * OPTIMIZE of a leaf partition), while this emits the metadata-
    * only file→bin assignment — which is what INCREMENTAL compaction
    * needs (rewrite only bins holding >1 file, leave already-right-
    * sized files untouched instead of re-shuffling 100 TB), what an
    * Iceberg/Delta-style rewrite job takes as its task list, and
    * what makes the maintenance job deterministic, resumable, and
    * auditable before any byte moves.
    *
    * Input is a file CATALOG — metadata, one row per file (~800k
    * rows at 100 TB / 128 MB), not data — so the window is the
    * adjudicated metadata-scale pattern (zone-map discipline); pass
    * `partitionCols` (the real-world case: compaction runs per table
    * partition) and the window never concentrates beyond a
    * partition's file count.
    *
    * Returns the input columns plus `bin` (0-based within each
    * partition group).
    */
  def compactionPlan(files: DataFrame, fileIdCol: String, sizeCol: String,
                     targetBytes: Long,
                     partitionCols: Seq[String] = Nil): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val base = if (partitionCols.isEmpty)
      org.apache.spark.sql.expressions.Window.partitionBy()
    else
      org.apache.spark.sql.expressions.Window.partitionBy(
        partitionCols.map(col): _*)
    val w = base.orderBy(col(sizeCol).desc, col(fileIdCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    files
      .withColumn("__cum", sum(col(sizeCol)).over(w))
      .withColumn("bin",
        expr(s"(__cum - `$sizeCol`) div ${targetBytes}L").cast("long"))
      .drop("__cum")
  }

  /** Write `df` as a BUCKETED table: hash-partitioned into `buckets`
    * files per partition on `keys`, optionally sorted within each
    * bucket. Bucketing is the write-once/join-forever layout: two
    * tables bucketed on their join key with the same bucket count
    * join WITHOUT any exchange (EnsureRequirements sees the
    * HashPartitioning already satisfied by the scan), and groupBy on
    * the bucket key skips its shuffle the same way. At 100 TB this is
    * the difference between re-shuffling a fact table on every query
    * and shuffling it once at ingest — the Spark-native equivalent of
    * the reference's pre-sorted on-disk runs (SURVEY.md §2 O2/O3,
    * `planet-dump-ng` sorts each table once and every consumer reads
    * the sorted run). Sorted buckets additionally give merge-join
    * without a sort step.
    *
    * The table lands in the session catalog (`spark.table(name)` to
    * read it back, bucket metadata intact). Overwrites any previous
    * table of the same name — bucketed layouts are rebuilt, not
    * appended to, when the bucket spec changes. A warehouse location
    * left behind by a FORGOTTEN table (session catalogs die with the
    * session; the filesystem does not) is removed first — without
    * this, the second session to ever run the job dies on
    * LOCATION_ALREADY_EXISTS. `name` must be a simple (unqualified)
    * table identifier.
    */
  def writeBucketed(df: DataFrame, name: String, buckets: Int,
                    keys: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    require(!name.contains(".") && !name.contains("`"),
      s"name must be a simple table identifier, got $name")
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(name)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
             else w
    ws.format("parquet").saveAsTable(name)
  }

  /** Small-file compaction (the lakehouse OPTIMIZE primitive): rewrite
    * a parquet directory into ≈`targetBytes` files. Streaming ingest,
    * per-trigger CDC snapshots and fine-grained partition writes all
    * accumulate kilobyte files; at 100 TB the resulting
    * task-per-tiny-file scheduling and footer-read overhead dominate
    * scan cost long before the data does, so compaction is a
    * first-class maintenance operator, not a nicety.
    *
    * File count = ceil(current bytes / targetBytes) (parquet re-encodes
    * so this over-estimates output size — conservative in the safe
    * direction). With `sortCols` the rewrite range-partitions + sorts
    * within files instead of hash-scattering, so each output file owns
    * a tight min/max envelope on the sort key — combine with
    * [[zValue]] for two-dimensional stats pruning. The rewrite lands
    * in `<dir>.compact.tmp` first and swaps in with two renames —
    * atomic on HDFS-like filesystems; on rename-as-copy object stores
    * run it under the table format's transaction (this operator
    * deliberately owns only the plain-directory case). For the
    * incremental variant — touch only the bins that need it — plan
    * with [[compactionPlan]] and rewrite per bin.
    *
    * Returns (files_before, files_after, bytes).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              targetBytes: Long = 128L << 20,
              sortCols: Seq[String] = Nil): (Long, Long, Long) = {
    require(targetBytes >= 1, s"targetBytes must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf)
    val entries = fs.listStatus(path)
    val subdirs = entries.filter(s => s.isDirectory &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    require(subdirs.isEmpty,
      s"compact: $dir is directory-partitioned (${subdirs.head.getPath.getName}, " +
        s"...) — compact each leaf partition directory instead, or the " +
        "rewrite would fold partition columns into the data files")
    val parts = entries.filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    require(parts.nonEmpty, s"compact: no data files under $dir")
    val bytes = parts.map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(dir)
    val out =
      if (sortCols.nonEmpty)
        df.repartitionByRange(n, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(n)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".compact.tmp")
    out.write.mode("overwrite").parquet(tmp.toString)
    val bak = new org.apache.hadoop.fs.Path(dir + ".compact.old")
    if (fs.exists(bak)) fs.delete(bak, true)
    if (!fs.rename(path, bak) || !fs.rename(tmp, path))
      throw new java.io.IOException(s"compact: swap failed for $dir")
    fs.delete(bak, true)
    val after = fs.listStatus(path).count { s =>
      val nm = s.getPath.getName
      s.isFile && !nm.startsWith("_") && !nm.startsWith(".")
    }
    (parts.length.toLong, after.toLong, bytes)
  }

  /** Z-order (Morton) key: interleave the low `bits` bits of two
    * non-negative dimensions — x in the even output bits, y in the
    * odd — so that sorting by the single z value keeps rows close in
    * BOTH dimensions close on disk. Writing a 100 TB table
    * range-partitioned + sorted by z gives min/max-stats pruning on
    * either dimension from one layout (the Delta/Iceberg Z-ORDER
    * mechanism); the key itself is this pure stateless expression —
    * the expensive part of z-ordering is the one range-sort the writer
    * already does, keyed by this column.
    *
    * Codegen-friendly: a fixed fold of shift/mask/add terms, no UDF.
    * Values above 2^bits wrap (only the low bits participate) — mask
    * or bucket wider domains first.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x.cast("long"), i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftrightunsigned(y.cast("long"), i).bitwiseAND(1), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** ZONE MAP (file-level min/max statistics): per file/bucket, the
    * (min, max, count) of each listed column — the metadata a lakehouse
    * writer records per parquet file and the scan planner prunes with
    * ("skip every file whose [min,max] misses the predicate"). Building
    * it is one map-side-combinable aggregate over the file-assignment
    * column; the map itself is files × columns rows — kilobytes for a
    * 100 TB table, the whole point. Values render as strings so
    * heterogeneous columns share one schema (columnProfile's contract).
    * Returns (file_id, col_name, n_rows, min_val, max_val).
    *
    * Pruning effectiveness is a plain filter over this frame: count
    * the files whose [min,max] intersects the predicate range — the
    * q176 gate does exactly that for a z-ordered vs a hash layout.
    */
  def zoneMap(df: DataFrame, fileCol: Column, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val allAggs = count(lit(1)).as("n_rows") +: aggs
    val wide = df.groupBy(fileCol.as("file_id"))
      .agg(allAggs.head, allAggs.tail: _*)
    val entries = cols.map(c =>
      struct(lit(c).as("col_name"), col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val")))
    wide.select(col("file_id"), col("n_rows"),
        explode(array(entries: _*)).as("__e"))
      .select(col("file_id"), col("__e.col_name").as("col_name"),
        col("n_rows"), col("__e.min_val").as("min_val"),
        col("__e.max_val").as("max_val"))
  }
}
