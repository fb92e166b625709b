package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-scale tokenizer training — byte-pair encoding (Sennrich et
  * al. 2016), the vocabulary-building step of an LLM data pipeline.
  *
  * Scale design: BPE never iterates over the corpus. ONE pass builds
  * the word-frequency table (map-side-combinable groupBy); every merge
  * round then runs over that compact table — distinct words are
  * ~millions at 100 TB vs trillions of corpus tokens, a ~10^6
  * reduction, and `minWordCount` bounds it further (hapax web garbage
  * dominates the distinct-word tail but cannot influence early
  * merges). Per round: one pair-count aggregate + a 1-row argmax
  * collect (the algorithm's inherent sync point — same adjudication
  * as Lloyd iterations and the CC convergence count), then a NARROW
  * per-word merge map (no shuffle). The word table rides
  * round-to-round as localCheckpoint blocks (lineage would otherwise
  * grow linearly in merges); each round's argmax action materializes
  * its checkpoint and frees the predecessor's blocks — the same
  * lifecycle [[Dedup.connectedComponents]] uses.
  *
  * Symbols are Unicode code points (`(?s).` in Java regex is
  * code-point aware — surrogate pairs stay one symbol), i.e.
  * character-level BPE; a byte-level variant is a representation
  * choice on top of the same machinery.
  */
object Tokenization {

  /** FEATURE HASHING (the "hashing trick", Weinberger et al.): map
    * each document's tokens into a fixed `dims`-bucket sparse count
    * vector via xxhash64(token) mod dims — the unbounded-vocabulary-
    * free featurizer for corpus-scale classifiers (quality models,
    * language ID, topic filters). Returns
    * (doc_id, n_dims, features) with features rendered as the sparse
    * "bucket:count" pairs in bucket order (the storable/hashable
    * form; parse back to a vector at train time).
    *
    * `dims` must be a power of two: the low bits of the SIGNED
    * xxhash64 equal the unsigned residue, so pmod(h, dims) is
    * engine-replicable without 64-bit-unsigned arithmetic. Shape:
    * explode → ONE map-side-combinable (doc, bucket) count → per-doc
    * ordered collect — two shuffles, both doc-keyed after the first
    * aggregate, no vocabulary table at all (that absence is the
    * operator's point). Docs with no tokens produce no row.
    */
  def featureHash(df: DataFrame, idCol: String, text: Column,
                  dims: Int = 64): DataFrame = {
    require(dims >= 2 && (dims & (dims - 1)) == 0,
      s"dims must be a power of two, got $dims")
    df.select(col(idCol).as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(text)).as("__t"))
      .select(col("doc_id"), pmod(xxhash64(col("__t")), lit(dims.toLong)).as("__b"))
      .groupBy("doc_id", "__b").agg(count(lit(1)).as("__c"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_dims"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__b"), col("__c")))),
          x => concat(x("__b").cast("string"), lit(":"),
            x("__c").cast("string")))).as("features"))
  }

  /** One BPE merge: at `rank`, (left, right) fused with corpus-weighted
    * adjacent-pair count `pairN`. */
  final case class Merge(rank: Int, left: String, right: String, pairN: Long)

  /** Corpus word-frequency table: (word, n). The only corpus-wide
    * job in tokenizer training — everything downstream is per-word. */
  def wordCounts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(TextFunctions.tokens(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  private def symbols(word: Column): Column =
    regexp_extract_all(word, lit("(?s)."), lit(0))

  /** Round-0 pair census: top `k` adjacent symbol pairs by
    * corpus-weighted count, (left_sym, right_sym, pair_n), with a
    * total-order tie-break (count desc, then pair) so the cut at `k`
    * is deterministic on any engine. */
  def bpePairStats(df: DataFrame, text: Column, k: Int = 100): DataFrame =
    pairCounts(wordCounts(df, text).select(symbols(col("word")).as("s"), col("n")))
      .orderBy(col("pair_n").desc, col("left_sym"), col("right_sym"))
      .limit(k)

  /** (s: array&lt;symbol&gt;, n) → corpus-weighted adjacent-pair counts.
    * The zip-of-slices form emits each adjacent pair exactly once per
    * word and the groupBy partial-aggregates map-side. */
  private def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("s")) >= 2)
      .select(col("n"),
        explode(arrays_zip(
          slice(col("s"), lit(1), size(col("s")) - 1).as("l"),
          slice(col("s"), lit(2), size(col("s")) - 1).as("r"))).as("p"))
      .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
      .agg(sum("n").as("pair_n"))

  /** Greedy leftmost non-overlapping application of ONE merge — the
    * standard BPE training step ("aaa" + merge(a,a) → ["aa","a"]). */
  private[operators] def mergeOnce(s: Seq[String], l: String, r: String): Seq[String] = {
    val out = new ArrayBuffer[String](s.length)
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { out += (l + r); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toSeq
  }

  /** Train `numMerges` BPE merges on the corpus. Stops early when the
    * best remaining pair's weighted count falls below `minPairCount`
    * (a merge seen once is noise, and the classic stop condition).
    * `minWordCount` drops rare words from the frequency table before
    * training — the standard vocabulary-bounding knob.
    *
    * Returns the ranked merge table (a local Seq: `numMerges` is
    * hundreds to tens of thousands — driver-side by nature, like a
    * k-means centroid array). All internal checkpoint blocks are
    * freed before returning.
    */
  def trainBpe(df: DataFrame, text: Column, numMerges: Int,
               minPairCount: Long = 2L, minWordCount: Long = 1L): Seq[Merge] = {
    require(numMerges >= 0, s"numMerges must be non-negative, got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    def free(id: Int): Unit =
      if (id >= 0) sc.getPersistentRDDs.get(id).foreach(_.unpersist(false))

    var words = wordCounts(df, text)
      .filter(col("n") >= minWordCount)
      .select(symbols(col("word")).as("s"), col("n"))
      .localCheckpoint(true) // eager: the corpus is scanned once, HERE
    // checkpoint ids read off each frame's own plan (PlanShim), never
    // by diffing global getPersistentRDDs (races with other queries)
    var liveCkpt = org.apache.spark.sql.graft.PlanShim.checkpointedRddId(words)
    var prevCkpt = -1 // last round's blocks, freed
                      // once the current round's are live
    val merges = ArrayBuffer.empty[Merge]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val topFrame = pairCounts(words)
        .orderBy(col("pair_n").desc, col("left_sym"), col("right_sym"))
        .limit(1)
      graft.TriggerPlanProbe.recordIter("bpe_train_argmax", topFrame)
      val top = topFrame.collect()
      // that collect materialized the current checkpoint (first action
      // on it) — the predecessor is unreachable from any future plan
      free(prevCkpt); prevCkpt = -1
      if (top.isEmpty || top(0).getAs[Long]("pair_n") < minPairCount) done = true
      else {
        val (l, r) = (top(0).getAs[String]("left_sym"), top(0).getAs[String]("right_sym"))
        merges += Merge(i, l, r, top(0).getAs[Long]("pair_n"))
        val next = words.as[(Seq[String], Long)]
          .map { case (s, n) => (mergeOnce(s, l, r), n) }
          .toDF("s", "n")
          .localCheckpoint(false) // lazy: next round's argmax is the action
        prevCkpt = liveCkpt
        liveCkpt = org.apache.spark.sql.graft.PlanShim.checkpointedRddId(next)
        words = next
      }
      i += 1
    }
    free(prevCkpt); free(liveCkpt) // result is local — nothing else lives
    merges.toSeq
  }

  /** Tokenize with a trained merge table: per word, repeatedly apply
    * the lowest-rank merge present (the standard BPE encode loop —
    * training-order replay guarantees an encode that saw the training
    * corpus reproduces its final word segmentations). Narrow per-row
    * transform, merge ranks broadcast. Returns (idCol, bpe_tokens). */
  def applyBpe(df: DataFrame, idCol: String, text: Column,
               merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rankB = spark.sparkContext.broadcast(
      merges.map(m => (m.left, m.right) -> m.rank).toMap)
    df.select(col(idCol).cast("long").as("id"), TextFunctions.tokens(text).as("w"))
      .as[(Long, Seq[String])]
      .map { case (id, ws) =>
        val rank = rankB.value
        val toks = ws.flatMap { w =>
          // split into code points — mirrors symbols() on the training side
          val cp = new ArrayBuffer[String]()
          var ci = 0
          while (ci < w.length) {
            val cc = Character.charCount(w.codePointAt(ci))
            cp += w.substring(ci, ci + cc); ci += cc
          }
          var cur: Seq[String] = cp.toSeq
          var improved = true
          while (improved && cur.length >= 2) {
            var bestRank = Int.MaxValue
            var bi = -1
            var j = 0
            while (j < cur.length - 1) {
              rank.get((cur(j), cur(j + 1))).foreach { rk =>
                if (rk < bestRank) { bestRank = rk; bi = j }
              }
              j += 1
            }
            if (bi < 0) improved = false
            else cur = mergeOnce(cur, cur(bi), cur(bi + 1))
          }
          cur
        }
        (id, toks)
      }
      .toDF(idCol, "bpe_tokens")
  }

  /** The BPE VOCABULARY a merge table induces over a corpus, with the
    * standard id convention (GPT-2 style): base alphabet first —
    * every distinct symbol (code point) in the corpus's words, ids
    * 0..B−1 in UTF-8 byte order — then one entry per merge at
    * B + rank. Returns a (token, token_id) frame sized
    * |alphabet| + |merges|.
    *
    * The alphabet is collected driver-side: it is bounded by the
    * Unicode alphabet by NATURE (same adjudication as the merge table
    * itself — real tokenizers ship it as a vocab.json). Ordering is
    * by UTF-8 bytes, not Java's UTF-16 code units, so the ids match
    * any binary-collation engine replaying the same rule.
    *
    * Fails fast if a merge RESULT collides with another merge's
    * result (two rules producing the same string would make token→id
    * ambiguous); base symbols (1 code point) cannot collide with
    * merge results (≥ 2).
    */
  def bpeVocab(df: DataFrame, text: Column, merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val utf8Order: Ordering[String] = (a: String, b: String) => {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      var d = 0
      while (i < n && d == 0) { d = (x(i) & 0xff) - (y(i) & 0xff); i += 1 }
      if (d != 0) d else x.length - y.length
    }
    val alphabet = df
      .select(explode(TextFunctions.tokens(text)).as("w")).distinct()
      .select(explode(symbols(col("w"))).as("s")).distinct()
      .as[String].collect().sorted(utf8Order)
    val mergeTokens = merges.map(m => m.left + m.right)
    require(mergeTokens.distinct.size == mergeTokens.size,
      "merge results must be distinct for an unambiguous vocab")
    val b = alphabet.length
    (alphabet.zipWithIndex.map { case (s, i) => (s, i.toLong) } ++
      merges.map(m => (m.left + m.right, (b + m.rank).toLong)))
      .toSeq.toDF("token", "token_id")
  }

  /** Encode a corpus into TOKEN IDS — the step every pretraining
    * pipeline runs at full corpus scale after training the tokenizer
    * once. [[applyBpe]]'s narrow per-row merge replay (ranks
    * broadcast, no shuffle), position-exploded and joined to the
    * (broadcast-small) vocab. Returns one row per emitted token:
    * (idCol, pos, token_id), pos 1-based over the document's token
    * stream; tokens absent from the vocab encode as −1 (unk) — never
    * produced when the vocab came from [[bpeVocab]] over the same
    * corpus, the documented fallback otherwise. Docs with no tokens
    * produce no rows.
    */
  def encodeIds(df: DataFrame, idCol: String, text: Column,
                merges: Seq[Merge], vocab: DataFrame): DataFrame =
    applyBpe(df, idCol, text, merges)
      .select(col(idCol), posexplode(col("bpe_tokens")))
      .join(broadcast(vocab), col("col") === vocab("token"), "left_outer")
      .select(col(idCol), (col("pos") + 1).cast("long").as("pos"),
        coalesce(col("token_id"), lit(-1L)).as("token_id"))

  /** Decode (idCol, pos, token_id) streams back to text — the
    * round-trip complement of [[encodeIds]]: id→token through the
    * broadcast vocab, tokens re-assembled in pos order (the ordered-
    * collect idiom — sorted struct array, no window). Whitespace is
    * NOT recoverable by design: [[applyBpe]] tokenizes on whitespace
    * before merging, so decode returns the whitespace-SQUASHED
    * document — exactly `concat(tokens(text))` — making the contract
    * "content fidelity through id space", not byte fidelity (GPT-2
    * byte-level vocabs fold the spaces INTO tokens instead; ours
    * keeps ids whitespace-free). Ids absent from the vocab (the −1
    * unk from [[encodeIds]], or a stale vocab) decode as U+FFFD and
    * are counted in `n_unk` — a nonzero n_unk is the drift alarm a
    * corpus/vocab version skew trips. One shuffle (the per-doc
    * regroup); the vocab side never shuffles.
    */
  def decodeIds(encoded: DataFrame, idCol: String, vocab: DataFrame): DataFrame =
    encoded.join(broadcast(vocab), Seq("token_id"), "left_outer")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"),
            coalesce(col("token"), lit("�")).as("token")))),
          x => x.getField("token")), "").as("decoded_text"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("token").isNull, 1L).otherwise(0L)).as("n_unk"))
}
