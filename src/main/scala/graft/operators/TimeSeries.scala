package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: turn an irregular event stream into a
  * fixed-interval series per key (the shape every monitoring join,
  * feature-store snapshot, and training-window builder wants).
  */
object TimeSeries {

  /** Resample to a regular `bucket`-width grid per key with
    * last-observation-carried-forward fill: one output row per
    * (key, bucket) from the key's first observed bucket to its last,
    * carrying the most recent observed value; `observed` marks real
    * buckets vs filled ones. Within a bucket the LAST event wins
    * (max `orderCol` — pass a unique id for a deterministic result).
    *
    * Shape (and why there is no spine join): the naive plan builds a
    * per-key calendar spine and left-joins observations back — a
    * second shuffle of the (key, bucket) set plus a join. Instead,
    * after the per-(key, bucket) aggregate, `lead(bucket)` over the
    * key gives each observation its fill horizon and ONE
    * `explode(sequence(bucket, next − step))` emits the observation
    * plus its carried copies directly — agg shuffle + key-window
    * shuffle, zero joins, and the explode is whole-stage-codegen'd.
    * Row amplification is bounded by `maxFillPerObs`: a key that goes
    * silent for months would otherwise emit an unbounded run of
    * copies (at 100 TB a handful of zombie keys can dominate the
    * output); beyond the cap the run is truncated and resumes at the
    * next real observation, keeping every partition's output bounded.
    *
    * Returns (key, bucket_ts, <value alias>, observed).
    */
  def resampleLocf(df: DataFrame, keyCol: String, tsCol: String,
                   value: Column, valueAlias: String, orderCol: String,
                   bucket: String = "hour",
                   maxFillPerObs: Int = 100000): DataFrame = {
    require(maxFillPerObs >= 1, "maxFillPerObs must be positive")
    val obs = df
      .groupBy(col(keyCol), date_trunc(bucket, col(tsCol)).as("bucket_ts"))
      .agg(max_by(value, col(orderCol)).as(valueAlias))
    val w = Window.partitionBy(keyCol).orderBy("bucket_ts")
    val step = s"INTERVAL '1' $bucket"
    obs
      .withColumn("__next", lead("bucket_ts", 1).over(w))
      .withColumn("__end",
        least(
          coalesce(expr(s"__next - $step"), col("bucket_ts")),
          expr(s"bucket_ts + $maxFillPerObs * $step")))
      .select(col(keyCol), col("bucket_ts").as("__obs_ts"), col(valueAlias),
        explode(expr(s"sequence(bucket_ts, __end, $step)")).as("fill_ts"))
      .select(col(keyCol), col("fill_ts").as("bucket_ts"), col(valueAlias),
        (col("fill_ts") === col("__obs_ts")).as("observed"))
  }
}
