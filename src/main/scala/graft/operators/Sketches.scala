package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-powered query plans — operators that use the custom sketch
  * aggregates ([[graft.plans.CountMinSketchAgg]],
  * [[graft.plans.HllRegistersAgg]]) to bound the state of otherwise
  * cardinality-shaped problems.
  */
object Sketches {

  /** EXACT heavy hitters without a full-cardinality shuffle: keys whose
    * true frequency is ≥ `threshold`, found in two passes —
    *
    *  1. a count-min sketch of the key stream (ONE tiny fixed-size
    *     aggregate state, no shuffle of data rows), broadcast back;
    *  2. rows whose sketch ESTIMATE clears the threshold — count-min
    *     never underestimates, so this prunes with ZERO false
    *     negatives — are exactly counted and re-filtered.
    *
    * The aggregate shuffle in pass 2 carries only rows of candidate
    * keys: with a billion-key long tail and a handful of heavy keys,
    * that is orders of magnitude less than the full groupBy a plain
    * HAVING needs, while the result is PROVABLY the exact answer (the
    * final filter re-checks true counts; sketch collisions only cost
    * extra candidates, never wrong output). The classic trade: pass 1
    * reads the data twice overall — same two-scan bound as every
    * census operator here (lineDedup, weightedByHash).
    *
    * Returns (key, n) for every key with n ≥ threshold.
    */
  def heavyHitters(df: DataFrame, keyCol: Column, threshold: Long,
                   depth: Int = 3, width: Int = 1024): DataFrame = {
    require(threshold >= 1, s"threshold must be positive, got $threshold")
    val keyed = df.select(keyCol.cast("long").as("key"))
    val sk = keyed.agg(
      graft.plans.CountMinSketch.sketch(col("key"), depth, width).as("__sk"))
    keyed.crossJoin(broadcast(sk))
      .filter(graft.plans.CountMinSketch.estimate(col("__sk"), col("key"),
        depth, width) >= threshold)
      .groupBy("key").agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }

  /** Deterministic bounded-sample quantile estimate per group: the
    * sample is the `k` rows with the lexicographically smallest
    * `md5(id)` (id tie-break) — a uniform pseudo-random sample that is
    * ORDER-INDEPENDENT (any partitioning/arrival order yields the
    * same set, unlike reservoir sampling), MERGEABLE (top-k-by-hash
    * distributes as per-partition partial top-k, the same bounded
    * state a KLL/GK sketch carries), and ENGINE-REPLICABLE (md5 hex
    * order is the same everywhere — so unlike GK/t-digest, the whole
    * estimate is exact-oracle-verifiable, the suite's md5-twin
    * pattern). The estimate is the nearest-rank order statistic
    * ⌈q·n'⌉ over the sorted sample; rank error is the standard
    * O(1/√k) sampling bound. Returns
    * (grp, n_rows, sample_n, est).
    *
    * Scale shape: one partitioned window ranks by hash inside each
    * group (the group's rows sort once — same exchange the final agg
    * needs), the ≤ k survivors collect into a bounded array. Groups
    * here are entities like sources/domains; for a GLOBAL quantile
    * use a constant group — the window then runs on one reducer and
    * the right form is `orderBy(hash).limit(k)` (TakeOrdered) instead.
    */
  def hashSampleQuantile(df: DataFrame, groupCol: String, idCol: String,
                         valueCol: String, k: Int, qPermille: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(qPermille >= 1 && qPermille <= 1000,
      s"qPermille must be in [1,1000], got $qPermille")
    import org.apache.spark.sql.expressions.Window
    val grpW = Window.partitionBy("grp")
    val rnW = grpW.orderBy(md5(col("__id").cast("string")), col("__id"))
    df.select(col(groupCol).as("grp"), col(idCol).as("__id"), col(valueCol).as("__v"))
      .withColumn("__n", count(lit(1)).over(grpW))
      .withColumn("__rn", row_number().over(rnW))
      .filter(col("__rn") <= k)
      .groupBy("grp")
      .agg(max("__n").as("n_rows"),
        count(lit(1)).as("sample_n"),
        sort_array(collect_list(col("__v"))).as("__s"))
      .select(col("grp"), col("n_rows"), col("sample_n"),
        element_at(col("__s"),
          greatest(lit(1L),
            expr(s"($qPermille * sample_n + 999) DIV 1000")).cast("int")).as("est"))
  }
}
