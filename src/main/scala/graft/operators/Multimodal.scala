package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * processed in partition-sized batches.
  *
  * The Spark-side shape is real and tested — binary columns, metadata
  * structs, batched `mapPartitions` with a fixed output schema,
  * partition-count control — while the actual media decode is STUBBED
  * with a deterministic fake (this environment ships no image/audio
  * codecs). Swapping `fakeDecode` for a real codec (JNI/FFI or a
  * vectorized Python worker) changes no plumbing.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false)))

  /** Build an opaque binary column + metadata from the documents table
    * (stand-in for real image/audio bytes).
    */
  def packBlobs(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("blob"),
      struct(
        lit("application/x-fake").as("mime"),
        (length(col("text")) % 64 * 16).cast("int").as("width"),
        (length(col("text")) % 48 * 16).cast("int").as("height")).as("meta"))

  /** ??? — real decode goes here. Deterministic fake: "decodes" the
    * blob into an 8-dim feature from byte statistics. Runs per batch
    * inside mapPartitions, the same call shape a vectorized decoder
    * (batch in, batch out) would use.
    *
    * Accumulates in double (sequential, ascending index) and narrows to
    * float once at the end — pure byte arithmetic an oracle engine can
    * reproduce exactly, which is what makes q33 hash-verifiable.
    */
  private def fakeDecode(blob: Array[Byte]): Array[Float] = {
    val acc = new Array[Double](8)
    var i = 0
    while (i < blob.length) {
      acc(i % 8) += (blob(i) & 0xff) / 255.0
      i += 1
    }
    acc.map(_.toFloat)
  }

  /** Batched feature extraction over the binary column. `batchSize`
    * models the decoder's batch shape (GPU/vectorized decoders want
    * fixed-size batches, not row-at-a-time).
    */
  def extractFeatures(blobs: DataFrame, batchSize: Int = 64): DataFrame = {
    val enc = Encoders.row(featureSchema)
    blobs.select("doc_id", "blob", "meta").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real decoder would submit one call
        batch.iterator.map { r =>
          val blob = r.getAs[Array[Byte]]("blob")
          val meta = r.getAs[Row]("meta")
          Row(r.getAs[Long]("doc_id"), blob.length.toLong,
            meta.getAs[String]("mime"), meta.getAs[Int]("width"),
            meta.getAs[Int]("height"), fakeDecode(blob).toSeq)
        }
      }
    }(enc)
  }

  /** Binary near-duplicate pairs by ALIGNED CHUNK FINGERPRINTS — the
    * storage-dedup move (fixed-size chunking + per-chunk hash) applied
    * to opaque media columns: two blobs are near-dups when ≥
    * `minShared` of their position-aligned `chunkBytes` chunks are
    * byte-identical (re-encoded copies, watermarked variants, padded
    * twins). Text-side dedup can't see these — the payload is binary.
    *
    * Scale shape (the duplicateSpans discipline, on bytes):
    *
    *   1. chunks explode ONCE; each chunk immediately becomes its
    *      8-byte `xxhash64` — chunk BYTES never shuffle;
    *   2. a (idx, hash) census drops chunks shared by more than
    *      `maxDocsPerChunk` blobs (all-zero padding blocks, shared
    *      headers: quadratic cost, zero dedup signal — the hot-bucket
    *      blacklist);
    *   3. the surviving 8-byte keys self-join on (idx, hash), one
    *      (a, b) count, two id-keyed joins attach chunk totals.
    *
    * overlap_ppm is against the SMALLER blob (containment — a short
    * clip fully inside a long one scores 10⁶). A 64-bit collision
    * would fabricate a pair; the gate's content-equality oracle
    * witnesses zero collisions on real data. Returns
    * (id_a, id_b, n_shared, n_chunks_a, n_chunks_b, overlap_ppm).
    */
  def chunkHashPairs(blobs: DataFrame, idCol: String, blobCol: String,
                     chunkBytes: Int = 64, minShared: Long = 2,
                     maxDocsPerChunk: Long = 1000): DataFrame = {
    require(chunkBytes >= 1, s"chunkBytes must be positive, got $chunkBytes")
    require(minShared >= 1, s"minShared must be positive, got $minShared")
    val nChunks = ceil(length(col(blobCol)).cast("double") / chunkBytes).cast("long")
    // the hashed-chunk projection feeds the hot census AND both join
    // sides — persist it (CacheRegistry lifecycle) so the blob decode
    // and hashing run one corpus pass, not three
    val chunks = CacheRegistry.register(blobs
      .select(col(idCol).as("__id"), col(blobCol).as("__b"), nChunks.as("__nc"))
      .filter(col("__nc") > 0)
      .select(col("__id"), col("__nc"),
        posexplode(transform(sequence(lit(0L), col("__nc") - 1),
          i => xxhash64(substring(col("__b"),
            (i * chunkBytes + 1).cast("int"), lit(chunkBytes))))))
      .select(col("__id"), col("__nc"), col("pos").as("__idx"), col("col").as("__h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val hot = chunks.groupBy("__idx", "__h").agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") > maxDocsPerChunk)
      .select("__idx", "__h")
    val kept = chunks.join(broadcast(hot), Seq("__idx", "__h"), "left_anti")
    val pairs = kept.as("x").join(kept.as("y"),
        col("x.__idx") === col("y.__idx") && col("x.__h") === col("y.__h") &&
          col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("id_a"), col("y.__id").as("id_b"),
        col("x.__nc").as("n_chunks_a"), col("y.__nc").as("n_chunks_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"),
        max("n_chunks_a").as("n_chunks_a"), max("n_chunks_b").as("n_chunks_b"))
      .filter(col("n_shared") >= minShared)
    pairs.select(col("id_a"), col("id_b"), col("n_shared"),
      col("n_chunks_a"), col("n_chunks_b"),
      expr("(1000000 * n_shared) div least(n_chunks_a, n_chunks_b)")
        .as("overlap_ppm"))
  }

  /** Frame-sample analogue: take every `stride`-th chunk of the blob as
    * a "frame" (binary slices with an index — the video-frame shape).
    */
  def sampleFrames(blobs: DataFrame, frameBytes: Int = 32, stride: Int = 4): DataFrame =
    blobs.select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), greatest((length(col("blob")) / (frameBytes * stride)).cast("int") - 1, lit(0))),
          i => substring(col("blob"), (i * frameBytes * stride + 1).cast("int"), lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
      .withColumn("frame_bytes", length(col("frame")).cast("long"))
}
