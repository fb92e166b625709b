package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout keys for write-side data clustering. */
object Layout {

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
}
