package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pre-training batch construction: assign each
  * document to a fixed-token-budget training sequence.
  */
object Packing {

  /** Pack documents into `seqLen`-token sequences, sharded for scale:
    * each doc lands in shard `xxhash64(id) mod shards`, docs pack in id
    * order within their shard, and a doc's sequence index is the one
    * its FIRST token falls into (`floor(start_offset / seqLen)` over a
    * shard-local running token count). Returns
    * (idCol, shard, n_tokens, seq_index).
    *
    * Scale shape: the only shuffle is the shard-partitioned window —
    * never an unpartitioned (single-reducer) window; size `shards` to
    * ≈ the cluster's target partition count and each reducer packs one
    * shard independently. Deterministic across runs and cluster sizes
    * (hash shard + id order), like the q46 hash split.
    *
    * This is the shard-local greedy approximation used for batch
    * indexing: a doc whose tokens span a sequence boundary is assigned
    * to the sequence it starts in; a packer that also SPLITS spanning
    * docs is a flat-map over each (shard, seq_index) group downstream.
    */
  def packSequences(df: DataFrame, idCol: String, text: Column,
                    seqLen: Int = 2048, shards: Int = 8): DataFrame = {
    require(seqLen >= 1 && shards >= 1, s"seqLen/shards must be positive")
    val w = Window.partitionBy("shard").orderBy(col(idCol))
    df.select(col(idCol),
        graft.functions.TextFunctions.tokenCount(text).as("n_tokens"),
        pmod(xxhash64(col(idCol)), lit(shards)).as("shard"))
      .withColumn("seq_index",
        floor((sum("n_tokens").over(w) - col("n_tokens")) / (seqLen * 1.0)).cast("long"))
  }

  /** Overlapping fixed-token chunking (the RAG / embedding-window
    * shape): one chunk per `stride` tokens, each spanning up to
    * `chunkTokens` tokens, so consecutive chunks overlap by
    * `chunkTokens - stride`. Pure per-row explode — embarrassingly
    * parallel, no shuffle at all. Empty docs produce no chunks.
    * Returns (idCol, chunk_index, start_token, n_chunk_tokens,
    * chunk_hash) — the hash stands in for the chunk text in the gate;
    * a production pipeline keeps the text/token slice itself.
    */
  def chunkDocuments(df: DataFrame, idCol: String, text: Column,
                     chunkTokens: Int = 64, stride: Int = 48): DataFrame = {
    require(chunkTokens >= 1 && stride >= 1 && stride <= chunkTokens,
      s"need 1 <= stride <= chunkTokens, got stride=$stride chunk=$chunkTokens")
    val withToks = df.select(col(idCol),
        graft.functions.TextFunctions.tokens(text).as("__t"))
      .filter(size(col("__t")) > 0)
    withToks
      .select(col(idCol), col("__t"),
        posexplode(sequence(lit(0), size(col("__t")) - 1, lit(stride))))
      .withColumnRenamed("pos", "chunk_index")
      .withColumnRenamed("col", "start_token")
      .withColumn("__chunk",
        slice(col("__t"), col("start_token") + 1, lit(chunkTokens)))
      .select(col(idCol),
        col("chunk_index").cast("long").as("chunk_index"),
        col("start_token").cast("long").as("start_token"),
        size(col("__chunk")).cast("long").as("n_chunk_tokens"),
        md5(array_join(col("__chunk"), " ")).as("chunk_hash"))
  }
}
