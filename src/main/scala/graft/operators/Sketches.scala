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
}
