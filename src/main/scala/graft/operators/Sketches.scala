package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Sketch-powered query plans — operators that use the custom sketch
  * aggregates ([[graft.plans.CountMinSketchAgg]],
  * [[graft.plans.HllRegistersAgg]]) to bound the state of otherwise
  * cardinality-shaped problems.
  */
object Sketches {

  /** KMV (k-minimum-values) DISTINCT sketch per group — Beyer et al.
    * 2007, the sketch family whose members support set INTERSECTION,
    * which HLL registers fundamentally cannot: keep the k smallest
    * xxhash64 values (unsigned order) of the group's distinct keys.
    * If the true distinct count n ≤ k, the sketch IS the hash set and
    * every estimate is exact; otherwise the k-th smallest normalized
    * hash U₍k₎ estimates density and n̂ = (k−1)/U₍k₎.
    *
    * Determinism contract: values are stored SIGN-FLIPPED
    * (h XOR 2⁶³, so signed BIGINT order = unsigned hash order — the
    * same trick any engine can replay), the array ascending. The
    * estimate is ⌊(k−1)·2⁶⁴ / (f₍k₎ + 2⁶³)⌋ in ONE double multiply +
    * divide + floor — every step an exactly-specified IEEE-754
    * operation, so the integer result is bit-identical on any
    * engine (no `round`, whose half-up/half-even convention differs).
    *
    * Scale shape: distinct (group, hash) shuffle, then a per-group
    * bottom-k window (rows = distinct pairs, the unavoidable census);
    * sketches are ≤ k longs per group — broadcast-sized artifacts,
    * mergeable by "union then re-take bottom k" ([[kmvPairOps]]).
    * Returns (group, sketch: array<long> flipped-ascending,
    * n_distinct: exact count, est: long).
    */
  def kmvSketch(df: DataFrame, groupCol: String, key: Column,
                k: Int = 256): DataFrame = {
    require(k >= 2, s"k must be at least 2, got $k")
    val flipped = df
      .select(col(groupCol).as("group"),
        xxhash64(key).bitwiseXOR(lit(Long.MinValue)).as("__f"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group")).orderBy(col("__f"))
    flipped
      .withColumn("__rn", row_number().over(w))
      .groupBy(col("group"))
      .agg(sort_array(collect_list(when(col("__rn") <= k, col("__f")))).as("sketch"),
        count(lit(1)).as("n_distinct"))
      .select(col("group"), col("sketch"), col("n_distinct"),
        kmvEstimate(col("sketch"), col("n_distinct"), k).as("est"))
  }

  /** n̂ from a flipped-ascending KMV sketch: exact when the sketch
    * holds every distinct value, else the (k−1)/U₍k₎ estimator in
    * deterministic double arithmetic (see [[kmvSketch]]).
    */
  private def kmvEstimate(sketch: Column, nIfExact: Column, k: Int): Column =
    when(size(sketch) < k, nIfExact).otherwise(
      floor(lit((k - 1).toDouble) * lit(1.8446744073709552e19) /
        (get(sketch, lit(k - 1)).cast("double") + lit(9.223372036854776e18)))
        .cast("long"))

  /** KMV SET-OPERATION estimates for every group pair (a < b): the
    * payoff over HLL — a valid KMV sketch of A∪B is "merge the two
    * sketches, re-take the bottom k", and the Jaccard estimate is the
    * fraction of that union sketch present in BOTH inputs (exact set
    * arithmetic on ≤k-long arrays), giving
    *
    *   Ĵ = |both ∩ unionK| / |unionK|,  n̂(A∪B) from unionK's k-th,
    *   n̂(A∩B) = ⌊Ĵ_milli · n̂(A∪B)⌋ / 1000
    *
    * All pair work runs on the sketch frame (#groups² pairs of
    * ≤k-long arrays — independent of corpus size; the broadcast side
    * of a dim-dim join). Returns (group_a, group_b, inter_k, union_k,
    * jaccard_milli, union_est, inter_est).
    */
  def kmvPairOps(sketches: DataFrame, k: Int = 256): DataFrame = {
    require(k >= 2, s"k must be at least 2, got $k")
    val a = sketches.select(col("group").as("group_a"),
      col("sketch").as("__ska"), col("n_distinct").as("__na"))
    val b = sketches.select(col("group").as("group_b"),
      col("sketch").as("__skb"), col("n_distinct").as("__nb"))
    a.join(broadcast(b), col("group_a") < col("group_b"))
      .withColumn("__uk",
        slice(array_sort(array_distinct(concat(col("__ska"), col("__skb")))),
          1, k))
      .withColumn("__ic",
        size(filter(col("__uk"), x =>
          array_contains(col("__ska"), x) && array_contains(col("__skb"), x)))
          .cast("long"))
      .withColumn("__jm", expr("(1000 * __ic) div size(__uk)"))
      // size(__uk) < k ⇒ the merged DISTINCT set had < k values ⇒ both
      // inputs were exact hash sets ⇒ the union count is exact too
      .withColumn("__uest",
        kmvEstimate(col("__uk"), size(col("__uk")).cast("long"), k))
      .select(col("group_a"), col("group_b"),
        col("__ic").as("inter_k"), size(col("__uk")).cast("long").as("union_k"),
        col("__jm").as("jaccard_milli"), col("__uest").as("union_est"),
        expr("(__jm * __uest) div 1000").as("inter_est"))
  }

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

  /** Equi-join output-size ESTIMATE from two count-min sketches — the
    * optimizer-statistics question ("how big is A ⋈ B on this key?")
    * answered without executing the join or shuffling either table:
    * |A ⋈ B| = Σ_k a_k·b_k, and the count-min inner product
    * min_i Σ_w cmA[i][w]·cmB[i][w] upper-bounds it (each cell product
    * adds only non-negative collision cross-terms; the min over rows
    * takes the tightest). The estimate is EXACT-deterministic: both
    * sketches are order-independent under the seed-chained engine hash
    * family, so the bound is a value contract, not a sample.
    *
    * Use it to pick join strategies up front (broadcast vs shuffle vs
    * pre-aggregate) or to refuse a query that would explode: two
    * single-pass fixed-state aggregates (no shuffle of data rows),
    * one crossJoin of two 1-row frames. Accuracy: tight while distinct
    * keys ≲ width (collision terms add ~(n_distinct/width)·|A|·|B|/width
    * in expectation); size `width` to the key cardinality you can
    * afford to be wrong about. Returns one row
    * (cm_join_size) — compare against the exact Σ a_k·b_k for the
    * contract test.
    */
  def joinSizeEstimate(a: DataFrame, keyA: Column, b: DataFrame, keyB: Column,
                       depth: Int = 3, width: Int = 4096): DataFrame = {
    val ska = a.agg(graft.plans.CountMinSketch.sketch(keyA, depth, width).as("__ska"))
    val skb = b.agg(graft.plans.CountMinSketch.sketch(keyB, depth, width).as("__skb"))
    val dots = (0 until depth).map { i =>
      aggregate(
        zip_with(slice(col("__ska"), i * width + 1, width),
          slice(col("__skb"), i * width + 1, width), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v)
    }
    ska.crossJoin(broadcast(skb))
      .select((if (dots.size == 1) dots.head else least(dots: _*))
        .as("cm_join_size"))
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
  /** Build a Bloom filter over a long key column as a STORABLE
    * DataFrame artifact: `numBits` bits packed into `numBits/64`
    * longs, one row per 64-bit word — (word INT, bits BIGINT). Bit
    * positions come from `numHashes` seed-chained engine hashes
    * (`xxhash64(i, key)`, the q120/q122 family), and `numBits` must be
    * a power of two so the signed `pmod` equals the unsigned low-bits
    * residue on every engine.
    *
    * This is the persistable membership summary for don't-re-shuffle
    * questions: write the words table once per corpus snapshot
    * (kilobytes for millions of keys), then prune any incoming batch
    * against it with [[bloomProbe]] — no false negatives, tunable
    * false-positive rate (m/n = 10 bits/key, k = 7 ≈ 0.8%). Unlike
    * the runtime bloom AQE injects into a single join, the artifact
    * outlives the job — the batch dedup pattern of
    * `Dedup.incrementalExact` without re-reading yesterday's hashes.
    *
    * Shuffle shape: one explode (×k) + one ≤`numBits/64`-group
    * aggregate; `bit_or` partials commute, so the words are
    * bit-identical under any partitioning.
    */
  def bloomBuild(df: DataFrame, keyCol: Column,
                 numBits: Int, numHashes: Int): DataFrame = {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 64, got $numBits")
    require(numHashes >= 1, s"numHashes must be positive, got $numHashes")
    val pos = df.select(keyCol.cast("long").as("key"))
      .select(explode(array((0 until numHashes).map(i =>
        pmod(xxhash64(lit(i.toLong), col("key")), lit(numBits.toLong))): _*))
        .as("pos"))
    pos.groupBy((col("pos") / 64).cast("int").as("word"))
      .agg(bit_or(expr("shiftleft(1L, CAST(pos % 64 AS INT))")).as("bits"))
  }

  /** Probe a [[bloomBuild]] words table: for each row of `probes`,
    * true iff ALL `numHashes` bit positions of its key are set.
    * Parameters must match the build call; the key column must be an
    * integral type (the same contract as bloomBuild's long cast — a
    * string key would silently hash NULL and every probe would agree).
    * Returns `probes` WITH ALL ITS COLUMNS plus a `bloom_hit` column
    * (duplicate keys keep their rows; a NULL key gets a NULL hit).
    *
    * Shuffle shape: the bit check runs on the DISTINCT key projection
    * (explode ×k, broadcast join against the ≤ `numBits/64`-row words
    * side, one map-side-combinable ALL-bits `min`), then one key-equi
    * join pins the verdict back onto the untouched probes frame.
    */
  def bloomProbe(words: DataFrame, probes: DataFrame, keyCol: String,
                 numBits: Int, numHashes: Int): DataFrame = {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 64, got $numBits")
    require(numHashes >= 1, s"numHashes must be positive, got $numHashes")
    val keyType = probes.schema(keyCol).dataType
    require(Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(keyType),
      s"bloom key column '$keyCol' must be integral, got $keyType")
    val checked = probes
      .select(col(keyCol).cast("long").as(keyCol)).distinct()
      .select(col(keyCol), explode(array((0 until numHashes).map(i =>
        pmod(xxhash64(lit(i.toLong), col(keyCol)), lit(numBits.toLong))): _*))
        .as("pos"))
      .withColumn("word", (col("pos") / 64).cast("int"))
      .join(broadcast(words), Seq("word"), "left_outer")
      .select(col(keyCol),
        // & 1, not % 2: a zero shift keeps the sign bit, and Spark's %
        // follows the dividend's sign — a negative word would read -1
        expr("shiftrightunsigned(coalesce(bits, 0L), CAST(pos % 64 AS INT)) & 1")
          .as("bit"))
    val hits = checked.groupBy(keyCol)
      .agg((min(col("bit")) === 1L).as("bloom_hit"))
    probes.join(hits, Seq(keyCol), "left_outer")
  }

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
