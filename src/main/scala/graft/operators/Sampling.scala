package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for data mixing / rebalancing. */
object Sampling {

  /** Keep the `n` docs per group that rank first by md5(id) — a
    * reproducible uniform-without-replacement sample per group (same
    * result on any cluster size or run).
    *
    * Two-phase for scale: a naive `row_number over (partition by
    * group)` streams EVERY row of a group through one task — a
    * billion-row source is a straggler. Phase 1 ranks within
    * (group, shard) where shard = xxhash64(id) mod `preShards` and
    * keeps n per shard: bounded partitions, and the union provably
    * contains each group's true top-n (any globally-top-n row is also
    * top-n within its own shard). Phase 2 re-ranks the ≤ preShards×n
    * survivors per group — tiny. Returns (idCol, groupCol,
    * sample_rank) with sample_rank ∈ [1, n] in md5 order.
    */
  def stratifiedByHash(df: DataFrame, idCol: String, groupCol: String,
                       n: Int, preShards: Int = 64): DataFrame = {
    require(n >= 1 && preShards >= 1, "n and preShards must be positive")
    val key: Column = md5(col(idCol).cast("string"))
    val pre = Window
      .partitionBy(col(groupCol), pmod(xxhash64(col(idCol)), lit(preShards)))
      .orderBy(key, col(idCol))
    val fin = Window.partitionBy(col(groupCol)).orderBy(key, col(idCol))
    df.select(col(idCol), col(groupCol))
      .withColumn("__pr", row_number().over(pre))
      .filter(col("__pr") <= n)
      .withColumn("sample_rank", row_number().over(fin).cast("long"))
      .filter(col("sample_rank") <= n)
      .select(col(idCol), col(groupCol), col("sample_rank"))
  }
}
