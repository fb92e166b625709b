package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus curation.
  *
  * All variants are shuffle-bounded: exact/normalized dedup is a single
  * hash aggregation; MinHash-LSH turns the quadratic all-pairs problem
  * into an equi-join on (band, bucket) keys so only probable duplicates
  * meet; SimHash buckets by fingerprint prefix. At 100 TB the band join
  * is the scale path — candidate pairs per bucket stay small as long as
  * band width balances recall vs. bucket size.
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct `col` value with
    * the minimum id as the keeper and the duplicate count.
    */
  def exact(df: DataFrame, idCol: String, col: Column): DataFrame =
    df.groupBy(md5(col).as("content_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Normalized dedup: lowercase + whitespace-collapse before hashing —
    * catches trivial reformattings.
    */
  def normalized(df: DataFrame, idCol: String, text: Column): DataFrame =
    exact(df, idCol, trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Word n-gram shingles (distinct), the unit set for Jaccard.
    * Custom Catalyst expression — the composed built-in form
    * (split → transform/slice → array_distinct) runs as interpreted
    * higher-order functions, ~1000× slower per row (see
    * plans.WordShingles).
    */
  def shingles(text: Column, n: Int = 3): Column =
    graft.plans.WordShingles.word_shingles(text, n)

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the minimum over the shingle set of xxhash64(seed ⊕ shingle).
    */
  def minhashSignature(text: Column, numHashes: Int = 64, n: Int = 3): Column = {
    val sh = shingles(text, n)
    transform(sequence(lit(0), lit(numHashes - 1)), seed =>
      aggregate(sh, lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(concat(s, lit("#"), seed.cast("string"))))))
  }

  /** MinHash+LSH candidate pairs: signatures split into `bands` bands
    * of `rows` hashes; docs sharing any band bucket become candidates,
    * then exact n-gram Jaccard verifies. Returns
    * (id_a, id_b, jaccard_ppm) with id_a < id_b.
    *
    * Shape matters at scale: the signature is computed relationally —
    * shingles exploded once, crossed with a broadcast seed table, and
    * min-reduced by a codegen'd hash aggregate — NOT as a nested
    * higher-order-function column (interpreted, and projection collapse
    * re-inlines it per band: measured 200× slower at sf0.1). Candidate
    * pairs are deduplicated before the shingle arrays are joined back,
    * so verification cost is per unique pair, not per bucket collision.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, text: Column,
                      bands: Int = 16, rows: Int = 4, n: Int = 3,
                      minJaccardPpm: Long = 500000L): DataFrame = {
    val numHashes = bands * rows
    val docs = df.select(col(idCol).as("doc_id"), shingles(text, n).as("sh"))
    // hash each shingle ONCE; seed s's value derives from (hg, s) —
    // and all numHashes min-reductions run as ONE codegen'd hash agg
    // (no seed cross join, no extra shuffle: partials combine map-side)
    val shingleRows = docs.select(col("doc_id"), explode(col("sh")).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("hg"))
    val minAggs = (0 until numHashes).map(s => min(xxhash64(col("hg"), lit(s))).as(s"m$s"))
    val minh = shingleRows.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
    // band bucket = hash of the band's min-hash columns
    val bucketCols = (0 until bands).map { bnd =>
      xxhash64((bnd * rows until (bnd + 1) * rows).map(i => col(s"m$i")): _*).as(s"bk$bnd")
    }
    val banded = minh.select(col("doc_id") +: bucketCols: _*)
      .select(col("doc_id"),
        posexplode(array((0 until bands).map(bnd => col(s"bk$bnd")): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val shA = docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val shB = docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    candidates.join(shA, "id_a").join(shB, "id_b")
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))) * 1000000.0 /
          size(array_union(col("sh_a"), col("sh_b")))).cast("long").as("jaccard_ppm"))
      .filter(col("jaccard_ppm") >= minJaccardPpm)
  }

  /** Exact pairwise n-gram Jaccard over a (small) candidate set —
    * the verification step of LSH, usable standalone at test scale.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, text: Column, n: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("doc_id"), explode(shingles(text, n)).as("g"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("inter") * 1000000.0 / (col("na") + col("nb") - col("inter"))).cast("long")
          .as("jaccard_ppm"))
  }

  /** SimHash near-dup buckets: docs sharing the top-`prefixBits` bits
    * of their simhash are near-dup candidates (cheap single shuffle).
    */
  def simhashBuckets(df: DataFrame, idCol: String, text: Column, prefixBits: Int = 16): DataFrame = {
    // single-pass expression, bit-identical to TextFunctions.simhash64
    // but one eval per row instead of 64 per-bit aggregate passes
    val sim = graft.plans.SimHash64.simhash64(text)
    df.select(col(idCol).as("doc_id"), sim.as("simhash"))
      .withColumn("bucket",
        (col("simhash") / java.math.BigDecimal.valueOf(2).pow(64 - prefixBits).longValue())
          .cast("long"))
  }
}
