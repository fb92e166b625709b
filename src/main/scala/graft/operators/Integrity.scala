package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-integrity primitives for cross-snapshot comparison — the
  * "did replication/backfill/migration change anything" check that at
  * 100 TB must not involve a sort or a row-level diff.
  */
object Integrity {

  /** Order-independent table checksum: xxhash64 each row's selected
    * columns (Spark's seed-chained multi-column path), sum the signed
    * hashes EXACTLY in decimal(38,0) — integer addition commutes, so
    * any partitioning yields the same sum; a 64-bit overflow wrap
    * would too, but ANSI mode makes long-sum overflow an error, and
    * the decimal sum is portable to engines with 128-bit integers —
    * then fold to a non-negative BIGINT mod 2^63−1. Comparing two
    * snapshots is comparing two single-row results: one scan each, a
    * map-side-combinable sum, no shuffle of data rows at all, no
    * ordering assumption. A content change that preserves the sum
    * requires colliding the 64-bit hash sum — the standard integrity
    * trade. Returns (n_rows, checksum).
    */
  def tableChecksum(df: DataFrame, cols: Seq[Column]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val p = "9223372036854775807" // 2^63 - 1
    df.select(xxhash64(cols: _*).cast("decimal(38,0)").as("__h"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__h")).as("__s"))
      .select(col("n_rows"),
        expr(s"CAST(((__s % $p) + $p) % $p AS BIGINT)").as("checksum"))
  }
}
