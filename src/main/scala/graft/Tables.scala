package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * All tables are single parquet files; at 100 TB these would be
  * partitioned directories — the read path is identical
  * (`spark.read.parquet` prunes partitions + columns either way).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read it as raw Long ns (legacy conf) and convert to
    * TimestampType at µs precision. NOTE the data carries real sub-µs
    * components — truncation matches what a DuckDB-1.0 oracle reading
    * the same file produces (it also truncates ns→µs), which is the
    * contract the correctness gate checks. The legacy conf is restored
    * after schema resolution (it is read eagerly at `read.parquet`).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try {
      import org.apache.spark.sql.functions._
      apply(s, d, "events")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
