package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-trained language-model scoring — the CCNet/Gopher-style
  * "perplexity filter" of an LLM curation pipeline: train a smoothed
  * bigram model on the corpus itself, score every document by its
  * surprisal under that model, and filter/bucket on the score. The
  * heuristic quality signals (`TextFunctions.qualityScoreMilli`, q26)
  * catch structural junk; the LM score catches fluent-looking word
  * salad and boilerplate the heuristics miss.
  */
object LanguageModel {

  /** Per-document bigram surprisal under an add-one-smoothed bigram LM
    * trained on the corpus itself, in EXACT integer arithmetic.
    *
    * Floating-point log-probs are not portable across engines (libm
    * `ln` ULPs, order-dependent double sums), so the per-bigram
    * surprisal −log2 P(w2|w1) with P = (c12+1)/(c1+V) is quantized to
    * whole BITS with an exact integer floor-log2:
    *
    *   ⌊log2 n⌋      = length(bin(n)) − 1          (no leading zeros)
    *   ⌊log2 (a/b)⌋  = k  if a ≥ b·2^k  else k−1,  k = ⌊log2 a⌋−⌊log2 b⌋
    *
    * Both `bin` and the shift are integer-exact in Spark and ANSI-SQL
    * oracles alike, so the per-doc sums are bit-identical on any
    * partitioning, any engine. The 1-bit granularity is the price of
    * that portability: each bigram's surprisal is within 1 bit of the
    * true −log2 P, and the per-doc AVERAGE over n bigrams concentrates
    * accordingly (the score separates fluent from improbable text; it
    * is a filter signal, not a calibrated perplexity). Sound for
    * context counts up to 2^62 (the shift never overflows a long
    * because b·2^k < 2^(⌊log2 a⌋+1)).
    *
    * Model choice: c1 counts CONTEXT occurrences (bigram starts, not
    * raw unigrams) and V is the context vocabulary — both derived from
    * the same (doc, w1, w2) count projection as c12, so the corpus is
    * exploded ONCE. Scale shape: one explode into a per-doc bigram
    * count aggregate (map-side combinable — the single wide shuffle of
    * the text), persisted under the [[CacheRegistry]] lifecycle
    * because four consumers derive from it (c12, c1, V, and the scored
    * join); the model tables c12/c1 are aggregates of that projection
    * (distinct-bigram-sized, shuffle-joined back, AQE broadcasts when
    * small), V is a one-row broadcast. Docs with fewer than 2 tokens
    * have no bigram evidence and are not scored (route them through a
    * length filter instead).
    *
    * Returns (doc_id, n_bigrams, surprisal_bits, avg_millibits) with
    * avg_millibits = ⌊1000·bits / n_bigrams⌋.
    */
  def bigramSurprisal(df: DataFrame, idCol: String, text: Column,
                      persistCounts: Boolean = true): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(text)
    val bi = df
      .select(col(idCol).as("doc_id"), toks.as("__a"))
      .filter(size(col("__a")) >= 2)
      .withColumn("__h", slice(col("__a"), lit(1), size(col("__a")) - 1))
      .withColumn("__t", slice(col("__a"), lit(2), size(col("__a")) - 1))
      .select(col("doc_id"),
        explode(arrays_zip(col("__h"), col("__t"))).as("__p"))
      .select(col("doc_id"), col("__p.__h").as("__w1"),
        col("__p.__t").as("__w2"))
    val bcRaw = bi.groupBy("doc_id", "__w1", "__w2")
      .agg(count(lit(1)).as("__c"))
    val bc =
      if (persistCounts)
        CacheRegistry.register(bcRaw.persist(StorageLevel.MEMORY_AND_DISK))
      else bcRaw
    val c12 = bc.groupBy("__w1", "__w2").agg(sum("__c").as("__c12"))
    val c1 = bc.groupBy("__w1").agg(sum("__c").as("__c1"))
    val v = c1.agg(count(lit(1)).as("__v"))
    bc.join(c12, Seq("__w1", "__w2"))
      .join(c1, Seq("__w1"))
      .crossJoin(broadcast(v))
      .withColumn("__bits", expr(
        """CASE WHEN (__c1 + __v) >= shiftleft(__c12 + 1,
          |       length(bin(__c1 + __v)) - length(bin(__c12 + 1)))
          |     THEN length(bin(__c1 + __v)) - length(bin(__c12 + 1))
          |     ELSE length(bin(__c1 + __v)) - length(bin(__c12 + 1)) - 1
          |END""".stripMargin))
      .groupBy("doc_id")
      .agg(sum("__c").cast("long").as("n_bigrams"),
        sum(col("__bits") * col("__c")).cast("long").as("surprisal_bits"))
      .withColumn("avg_millibits",
        expr("(1000 * surprisal_bits) div n_bigrams"))
  }
}
