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

  /** LINEAR-INTERPOLATION resample — the numeric twin of
    * [[resampleLocf]]: irregular per-key observations onto a regular
    * grid, gaps filled by the straight line between the surrounding
    * observations instead of carrying the last value. For
    * continuously-varying telemetry (temperatures, prices, rates)
    * LOCF introduces a sawtooth bias; linear is the standard
    * feature-store choice. Values must be integer-quantized (cents):
    * the interpolated point is
    *
    *   v(k) = v₁ + ⌊(v₂ − v₁)·k / n⌋   (k of n grid steps into the gap)
    *
    * with an EXPLICIT floor correction for negative slopes (both
    * Spark's `div` and SQL engines' integer division truncate toward
    * zero — the EWMA lesson, applied in the formula itself), so every
    * emitted value is bit-portable. Each observation emits itself plus
    * its gap's interior points; the NEXT observation emits its own
    * row, so grid points appear exactly once. The final observation
    * has no successor and emits only itself (no extrapolation).
    * `bucket` must be a fixed-width unit (hour/day — not month).
    *
    * Same shuffle shape as LOCF: one (key, bucket) aggregate, one
    * lead() window on the same exchange, one explode; `maxFillPerObs`
    * bounds zombie-gap amplification. Returns
    * (key, bucket_ts, <valueAlias>, observed).
    */
  def resampleLinear(df: DataFrame, keyCol: String, tsCol: String,
                     valueCents: Column, valueAlias: String, orderCol: String,
                     bucket: String = "hour",
                     maxFillPerObs: Int = 100000): DataFrame = {
    require(maxFillPerObs >= 1, "maxFillPerObs must be positive")
    val stepUs = bucket match {
      case "hour" => 3600000000L
      case "day" => 86400000000L
      case "minute" => 60000000L
      case other => throw new IllegalArgumentException(
        s"bucket must be a fixed-width unit (minute/hour/day), got $other")
    }
    val obs = df
      .groupBy(col(keyCol), date_trunc(bucket, col(tsCol)).as("bucket_ts"))
      .agg(max_by(valueCents, col(orderCol)).cast("long").as("__v"))
    val w = Window.partitionBy(keyCol).orderBy("bucket_ts")
    val step = s"INTERVAL '1' $bucket"
    obs
      .withColumn("__nts", lead("bucket_ts", 1).over(w))
      .withColumn("__nv", lead("__v", 1).over(w))
      .withColumn("__n", expr(s"(unix_micros(__nts) - unix_micros(bucket_ts)) div $stepUs"))
      .select(col(keyCol), col("bucket_ts"), col("__v"), col("__nv"),
        col("__n"),
        explode(expr(
          s"sequence(0L, least(coalesce(__n - 1, 0L), CAST($maxFillPerObs AS LONG)))"))
          .as("__k"))
      .select(col(keyCol),
        expr(s"bucket_ts + __k * $step").as("bucket_ts"),
        expr("""__v + CASE WHEN __k = 0 THEN 0L
               |  ELSE ((__nv - __v) * __k) div __n
               |       - (CASE WHEN ((__nv - __v) * __k) % __n != 0
               |                AND (__nv - __v) < 0 THEN 1 ELSE 0 END)
               |END""".stripMargin).as(valueAlias),
        (col("__k") === 0).as("observed"))
  }

  /** TIME-WEIGHTED AVERAGE per key (the TWAP of finance, the
    * duration-correct mean of any step-function telemetry): each
    * observation's value holds from its timestamp until the NEXT
    * observation, so the mean weights each value by how long it was
    * in force — an event-frequency-biased plain avg over-counts
    * bursts. The key's final observation has no horizon and
    * contributes nothing (standard closed-interval TWAP; feed a
    * query-time "now" row upstream to include it).
    *
    * EXACT integer arithmetic: `valueCents` (integer-quantized) ×
    * µs-durations sum as longs — commutative, so bit-identical on
    * any partitioning/engine — and one final integer division:
    * twap_cents = ⌊Σ(c·Δ) / ΣΔ⌋. Sound while Σ(c·Δ) < 2^63 (~10^4
    * cents over ~30 years of µs per key). Keys whose observations all
    * share one timestamp have zero total duration and are dropped
    * (no interval to average; the ANSI div would error).
    *
    * One shuffle: the lead() window on (key | ts, tie) feeds a
    * map-side-combinable aggregate that reuses the same partitioning.
    * Returns (key, n_intervals, twap_cents).
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsUs: Column,
                      valueCents: Column, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col("__t"), col(tieCol))
    df.select(col(keyCol), tsUs.as("__t"), valueCents.as("__c"), col(tieCol))
      .withColumn("__next", lead("__t", 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__next") - col("__t")).as("__dur"),
        sum(col("__c") * (col("__next") - col("__t"))).as("__wsum"))
      .filter(col("__dur") > 0)
      .select(col(keyCol), col("n_intervals"),
        expr("__wsum div __dur").as("twap_cents"))
  }

  /** Per-key LINEAR TREND (OLS slope) of a value over time — the
    * "is this metric drifting" detector (billing creep, sensor decay,
    * engagement decline) as one aggregate, no window:
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *
    * with x = the epoch-`hour` index (t_us div 3600·10^6 — the hour
    * truncation is the DEFINED model, making x a small exact integer)
    * and y = `valueCents`. Everything is integer: the five sufficient
    * statistics (n, Σx, Σy, Σxy, Σx²) are ONE map-side-combinable
    * aggregate — commutative sums, bit-identical on any partitioning
    * — and the slope is scaled to milli-cents/hour with a final
    * integer division. Truncation is toward zero on BOTH engines by
    * construction: the division runs on |numerator| and the sign is
    * re-applied (floor-vs-trunc divergence on negatives is the
    * classic cross-engine trap). Keys whose observations all fall in
    * one hour have zero x-variance and are dropped (no trend is
    * estimable). Sound for ~10^6 rows/key at 10^4-cent values
    * (n·Σxy < 2^63 with 2024-era hour indexes ≈ 4.7·10^5).
    *
    * Returns (key, n_obs, slope_milli) — milli-cents per hour.
    */
  def groupTrend(df: DataFrame, keyCol: String, tsUs: Column,
                 valueCents: Column): DataFrame = {
    val base = df.select(col(keyCol), tsUs.cast("long").as("__tus"),
        valueCents.cast("long").as("__y"))
      .withColumn("__x", expr("__tus div 3600000000L"))
    base.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"), sum("__x").as("__sx"),
        sum("__y").as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .withColumn("__num", col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__den", col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .filter(col("__den") > 0)
      .select(col(keyCol), col("__n").as("n_obs"),
        (signum(col("__num")).cast("long") *
          expr("(1000 * abs(__num)) div __den")).as("slope_milli"))
  }

  /** MAD-based ROBUST outlier detection per key — the
    * median-absolute-deviation complement to the rolling z-score
    * (q135): mean/σ are themselves dragged by the outliers they
    * should flag; the median and MAD are 50%-breakdown-robust. A row
    * is an outlier when |v − median| > `k`·MAD.
    *
    * EXACT order statistics, no floats: the per-key median is the
    * ((n+1) div 2)-th smallest value (the rank-exact lower median,
    * q84's convention — an actual data value, so every derived
    * quantity stays integer), and MAD is the same order statistic of
    * |v − median|. A key where over half the values are identical
    * has MAD = 0; the `> k·0` test then flags every value not equal
    * to the median — the documented degenerate-MAD behavior
    * (robust-stats convention: zero spread means any deviation is
    * infinite in MAD units).
    *
    * Shape: two rank windows and two joins, ALL keyed by `keyCol` —
    * one exchange establishes the partitioning, the rest reuse it.
    * Ties rank by `tieCol` for a strict total order. Returns the
    * flagged rows: (tie, key, cents, med, mad).
    */
  def madOutliers(df: DataFrame, keyCol: String, valueCents: Column,
                  tieCol: String, k: Long = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = df.select(col(tieCol), col(keyCol), valueCents.as("cents"))
    val w1 = Window.partitionBy(keyCol).orderBy(col("cents"), col(tieCol))
    val med = base
      .withColumn("__rn", row_number().over(w1))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(keyCol)))
      .filter(col("__rn") === expr("(__n + 1) div 2"))
      .select(col(keyCol), col("cents").as("med"))
    val dev = base.join(med, Seq(keyCol))
      .withColumn("__d", abs(col("cents") - col("med")))
    val w2 = Window.partitionBy(keyCol).orderBy(col("__d"), col(tieCol))
    val mad = dev
      .withColumn("__rn", row_number().over(w2))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(keyCol)))
      .filter(col("__rn") === expr("(__n + 1) div 2"))
      .select(col(keyCol), col("__d").as("mad"))
    dev.join(mad, Seq(keyCol))
      .filter(col("__d") > lit(k) * col("mad"))
      .select(col(tieCol), col(keyCol), col("cents"), col("med"), col("mad"))
  }

  /** First-order MARKOV TRANSITION MATRIX over per-key event
    * sequences: corpus-wide (from_state, to_state) counts and
    * milli-probabilities — the behavioral fingerprint behind funnel
    * design, bot detection (impossible transition rates), and
    * session simulation. Transitions are consecutive within a key's
    * (ts, tie) order; the last event of each key emits none.
    *
    * Shape: one key-window lead() (the only wide shuffle of raw
    * rows) feeding a map-side-combinable pair count; row
    * probabilities normalize with a self-aggregate join on
    * from_state (states ≪ rows — AQE broadcasts it). p_milli =
    * (1000·n) div Σn per from_state — exact integer, rows sum to
    * ≤ 1000 with the floor remainder (use n for exact work).
    * Returns (from_state, to_state, n, p_milli).
    */
  def transitionMatrix(df: DataFrame, keyCol: String, tsUs: Column,
                       state: Column, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col("__t"), col(tieCol))
    val t = df.select(col(keyCol), tsUs.as("__t"), state.as("from_state"), col(tieCol))
      .withColumn("to_state", lead("from_state", 1).over(w))
      .filter(col("to_state").isNotNull)
      .groupBy("from_state", "to_state").agg(count(lit(1)).as("n"))
    val tot = t.groupBy("from_state").agg(sum("n").as("__tn"))
    t.join(tot, Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n"),
        expr("(1000 * n) div __tn").as("p_milli"))
  }

  /** INTERVAL COVERAGE per key — merge overlapping/touching half-open
    * intervals [s, e) and report how much of the timeline each key
    * actually covers: uptime/SLA computation, sensor-coverage audits,
    * "how many distinct active spans did this user have". The classic
    * gaps-and-islands: per key, order by (s, e); an island starts
    * where s exceeds the running max of all previous ends; islands
    * aggregate to (min s, max e).
    *
    * Both windows (running max, island id) share ONE key-partitioned
    * exchange; per-key state is the sort, not a collect. Returns
    * (key, n_intervals, n_islands, covered_us) with covered_us =
    * Σ island lengths — exact integers.
    */
  def intervalCoverage(df: DataFrame, keyCol: String,
                       startUs: Column, endUs: Column): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col("__s"), col("__e"))
    val prevMax = max("__e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.select(col(keyCol), startUs.as("__s"), endUs.as("__e"))
      .filter(col("__e") > col("__s"))
      .withColumn("__newIsland",
        when(prevMax.isNull || col("__s") > prevMax, 1L).otherwise(0L))
      .withColumn("__island",
        sum("__newIsland").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island"))
      .agg(count(lit(1)).as("__n"), min("__s").as("__is"), max("__e").as("__ie"))
      .groupBy(keyCol)
      .agg(sum("__n").cast("long").as("n_intervals"),
        count(lit(1)).cast("long").as("n_islands"),
        sum(col("__ie") - col("__is")).cast("long").as("covered_us"))
  }

  /** TRENDING DETECTION by rank movement: per time bucket, rank keys
    * by activity; emit each (bucket, key) with its rank, the previous
    * bucket's rank (null on first appearance) and the signed movement
    * — "what rose this period" without a magnitude threshold that
    * breaks when overall volume shifts. Rank ties break by key, so
    * the movement is a value, not a sample.
    *
    * Shuffle shape: one (bucket, key) count aggregate, one
    * bucket-partitioned rank window, one key-partitioned lag window —
    * the two windows use different partitionings, so there are two
    * exchanges of the (buckets × keys)-bounded count frame, never of
    * raw rows. Returns (bucket, key, n, rank, prev_rank, movement).
    */
  def trendingRank(df: DataFrame, bucket: Column, key: Column): DataFrame = {
    val counts = df.select(bucket.as("bucket"), key.as("key"))
      .groupBy("bucket", "key").agg(count(lit(1)).as("n"))
    val rankW = Window.partitionBy("bucket").orderBy(col("n").desc, col("key"))
    val lagW = Window.partitionBy("key").orderBy(col("bucket"))
    counts
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .withColumn("prev_rank", lag("rank", 1).over(lagW))
      .withColumn("movement", col("prev_rank") - col("rank"))
  }

  /** Ordered event-path TRIGRAMS per key: the 3-step behavioral motifs
    * ([[transitionMatrix]]'s bigrams one step deeper — funnels and bot
    * signatures often only show at length 3). Two lead() steps on one
    * key-partitioned, (ts, tie)-ordered window — ONE exchange serves
    * both leads — then a map-side-combinable count and a strict-order
    * TakeOrdered top-k. Returns (s1, s2, s3, n).
    */
  def pathTrigrams(df: DataFrame, keyCol: String, tsUs: Column,
                   state: Column, tieCol: String, topK: Int = 50): DataFrame = {
    require(topK >= 1, s"topK must be positive, got $topK")
    val w = Window.partitionBy(keyCol).orderBy(col("__t"), col(tieCol))
    df.select(col(keyCol), tsUs.as("__t"), state.as("s1"), col(tieCol))
      .withColumn("s2", lead("s1", 1).over(w))
      .withColumn("s3", lead("s1", 2).over(w))
      .filter(col("s3").isNotNull)
      .groupBy("s1", "s2", "s3").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
      .limit(topK)
  }

  /** INTEGER EWMA per key — exponential smoothing with α = 2⁻ᵏ in
    * pure integer arithmetic:
    *
    *   s₀ = x₀,   sₜ = sₜ₋₁ + ⌊(xₜ − sₜ₋₁) / 2ᵏ⌋
    *
    * The floor division is an ARITHMETIC RIGHT SHIFT — the semantic
    * contract is FLOOR, stated explicitly because integer division
    * differs across engines (Spark `div` and DuckDB integer `//` both
    * truncate toward zero; an oracle must add the negative-remainder
    * correction). The result is the smoothed monitoring value
    * bit-identical on any engine that honors the floor contract; α
    * restricted to powers of two is the standard trick (DSP leaky
    * integrators) and costs nothing for alerting thresholds.
    *
    * EWMA is inherently a sequential recurrence — no window frame
    * expresses it — so each key's series is collected into ONE ordered
    * array and folded: per-key state is bounded by series length
    * (monitoring series: thousands of points, fine; do NOT feed
    * unbounded event streams — resample with [[resampleLocf]] first,
    * exactly what a production smoother does). One shuffle to the
    * per-key aggregate; order inside the fold is the strict
    * (ts, value) sort, so duplicate timestamps cannot flip results.
    * Returns (key, n_obs, ewma_cents).
    */
  def ewmaInteger(df: DataFrame, keyCol: String, tsUs: Column,
                  valueCents: Column, shiftK: Int = 3): DataFrame = {
    require(shiftK >= 1 && shiftK <= 30, s"shiftK must be in [1,30], got $shiftK")
    df.select(col(keyCol), tsUs.as("__t"), valueCents.cast("long").as("__v"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_obs"),
        sort_array(collect_list(struct(col("__t"), col("__v")))).as("__s"))
      .select(col(keyCol), col("n_obs"),
        aggregate(expr("slice(__s, 2, size(__s) - 1)"),
          element_at(col("__s"), 1).getField("__v"),
          (acc, x) => acc + shiftright(x.getField("__v") - acc, shiftK))
          .as("ewma_cents"))
  }
}
