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
