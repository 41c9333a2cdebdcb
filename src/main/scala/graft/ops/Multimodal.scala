package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) as opaque `binary`
  * columns with typed metadata, processed by a per-partition typed pipeline.
  *
  * The Spark-side plumbing — schema, partition-batched iteration, typed
  * output shape — is real and tested; the actual media decode is STUBBED
  * (deterministic fake) because no image/audio codec libraries exist in this
  * environment. Swap [[decodeStub]] for a real decoder to productionize.
  */
object Multimodal {

  /** Typed row for an extracted media feature record. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      format_sig: String,     // first-bytes signature (magic-number analog)
      width: Int,             // STUB: deterministic fake dimensions
      height: Int,
      embedding: Array[Float] // STUB: deterministic fake feature vector
  )

  /** ===== STUB DECODER =====
    * Deterministic fake "decode + feature-extract" over raw media bytes.
    * Real implementation would decode the image/audio frame here; the
    * surrounding batching, schema, and partitioning stay identical. */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length
    val sig = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
    // fake dims/embedding derived from content so output is deterministic
    var h = 1125899906842597L
    var i = 0
    while (i < n) { h = 31 * h + bytes(i); i += 1 }
    val emb = Array.tabulate(4)(k => ((h >>> (k * 8)) & 0xff).toFloat / 255.0f)
    MediaFeatures(docId, n.toLong, sig,
      width = (math.abs(h) % 1920).toInt + 1,
      height = (math.abs(h / 7) % 1080).toInt + 1,
      embedding = emb)
  }

  /** Binary-column feature extraction: one decoder call per row, iterated
    * per partition (the batch shape a real codec wants — amortized init,
    * no per-row JNI/process setup). Input: (doc_id, media binary). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (real codec handle)
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Demo pipeline used by the rows-only parity query: synthesize a binary
    * media column from document text (UTF-8 bytes), then extract features.
    * Partitioned by a media-size-aware repartition so decode work spreads
    * evenly even when a few blobs are huge (the multimodal skew story). */
  def featuresOverDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .repartition(col("doc_id") % 16) // spread blobs; real impl: by size class
    extractFeatures(spark, docs).toDF()
      .select(col("doc_id"), col("n_bytes"), col("format_sig"),
        col("width"), col("height"),
        round(element_at(col("embedding"), 1), 4).as("emb0"),
        round(element_at(col("embedding"), 2), 4).as("emb1"))
  }
}
