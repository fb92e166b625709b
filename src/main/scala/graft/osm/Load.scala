package graft.osm

import java.nio.file.{Files, Paths}
import scala.collection.parallel.CollectionConverters._
import scala.io.Source
import scala.sys.process._
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Load phase: pg_dump custom archive → per-table sorted Parquet.
  *
  * Reference behavior (S1–S6, O2): 12 tables extracted concurrently via
  * `pg_restore -a -t <table>` (`src/dump_archive.cpp:94-119`,
  * `src/dump_reader.cpp:656-663`), rows decoded and externally sorted by
  * the table's key prefix, with a running max-timestamp folded across
  * tables (`src/planet-dump.cpp:144-151`).
  *
  * Spark shape: the pg_restore stage is a driver-side subprocess (the
  * archive format is sequential by nature); everything after the staged
  * text is distributed — `spark.read.textFile` → decoder `map` →
  * `repartitionByRange(sortKeys).sortWithinPartitions` → Parquet. The
  * external merge sort, spill management, and merge cascades of the
  * reference are Catalyst's `ExchangeExec`+`SortExec` here. Re-runs skip
  * tables whose Parquet output already exists (resume, S6).
  */
object Load {

  /** Find the COPY header line of a staged table text file. */
  def copyHeader(textPath: String): String = {
    val src = Source.fromFile(textPath, "UTF-8")
    try src.getLines().find(_.startsWith("COPY "))
      .getOrElse(throw new IllegalStateException(s"no COPY header in $textPath"))
    finally src.close()
  }

  /** Decode one staged table text file into a typed DataFrame. */
  def decodeTable(spark: SparkSession, table: Schema.Table, textPath: String): DataFrame = {
    val idx = CopyDecoder.reorder(table, CopyDecoder.parseCopyHeader(copyHeader(textPath)))
    val enc = Encoders.row(table.schema)
    val parser = CopyDecoder.rowParser(table, idx)
    spark.read.textFile(textPath)
      .filter(CopyDecoder.isDataLine _)
      .map(parser)(enc)
  }

  /** Extract one table to staging text via pg_restore; returns the path.
    * No-op if already staged (resume).
    */
  def stage(dumpFile: String, table: String, stagingDir: String): String = {
    Files.createDirectories(Paths.get(stagingDir))
    val out = s"$stagingDir/$table.txt"
    if (!Files.exists(Paths.get(out))) {
      // attempt-unique tmp name: concurrent callers staging the same
      // table each write their own file; the losers' ATOMIC_MOVE onto
      // an existing target is simply discarded (same bytes either way)
      val tmp = s"$out.${java.util.UUID.randomUUID().toString.take(8)}.tmp"
      val cmd = Seq("pg_restore", "-a", "-f", tmp, "-t", table, dumpFile)
      val rc = cmd.!
      require(rc == 0, s"pg_restore failed ($rc) for table $table")
      try Files.move(Paths.get(tmp), Paths.get(out),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(Paths.get(tmp)) // another caller won the race
      }
    }
    out
  }

  /** Full load: stage + decode + sorted-parquet every table; returns the
    * global max timestamp (reference planet `timestamp` attr / "now"),
    * or None when the dump has no timestamped rows (empty dump →
    * neg-infinity path, `src/xml_writer.cpp:86-88`).
    */
  def run(spark: SparkSession, dumpFile: String, workDir: String): Option[java.sql.Timestamp] = {
    val staging = s"$workDir/staging"
    val tablesDir = s"$workDir/tables"
    // driver-side staging in parallel — one subprocess per table, like
    // the reference's 12 extraction threads
    Schema.all.par.foreach(t => stage(dumpFile, t.name, staging))
    val maxTimes = Schema.all.map { t =>
      val out = s"$tablesDir/${t.name}"
      if (!Files.exists(Paths.get(s"$out/_SUCCESS"))) {
        val df = decodeTable(spark, t, s"$staging/${t.name}.txt")
        val sortCols = t.sortKeys.map(col)
        df.repartitionByRange(sortCols: _*)
          .sortWithinPartitions(sortCols: _*)
          .write.mode("overwrite").parquet(out)
      }
      t.maxTimeCol.map { c =>
        spark.read.parquet(out).agg(max(col(c))).head.getTimestamp(0)
      }
    }
    maxTimes.flatten.filter(_ != null) match {
      case Nil => None
      case ts => Some(ts.maxBy(_.getTime))
    }
  }
}

/** Handle to a loaded dump directory (Parquet per table). */
final case class OsmDb(spark: SparkSession, tablesDir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$tablesDir/$name")
  def changesets: DataFrame = table("changesets")
  def nodes: DataFrame = table("nodes")
  def ways: DataFrame = table("ways")
  def relations: DataFrame = table("relations")
  def users: DataFrame = table("users")
}
