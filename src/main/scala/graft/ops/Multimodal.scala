package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) as opaque `binary`
  * columns with typed metadata, processed by a per-partition typed pipeline.
  *
  * The Spark-side plumbing — schema, partition-batched iteration, typed
  * output shape — is real and tested, and so are the decoders: PNG
  * (dependency-free [[Png]] codec over `java.util.zip`: chunk walk, CRC
  * validation, zlib inflate), GIF ([[Gif]]: real variable-width LZW),
  * BMP ([[Bmp]]: palette + stride matrix read), JPEG dims ([[Jpeg]] marker
  * walk), WAV ([[Wav]] RIFF walk) and AVI metadata ([[Avi]]). Bytes with
  * no recognized magic fall back to [[decodeStub]] — a deterministic fake
  * standing in for codecs that don't exist in this environment.
  */
object Multimodal {

  /** Typed row for an extracted media feature record. `width`/`height`/
    * `pixel_sum` are REAL for PNG inputs (parsed + inflated), stubbed
    * otherwise. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      format_sig: String,     // first-bytes signature (magic-number analog)
      width: Int,
      height: Int,
      pixel_sum: Long,        // sum of decoded pixel values (-1 for non-PNG)
      embedding: Array[Float]
  )

  /** ===== STUB DECODER (non-PNG formats only) =====
    * Deterministic fake "decode + feature-extract" over raw media bytes.
    * Real implementation would decode the frame here; the surrounding
    * batching, schema, and partitioning stay identical. */
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
      pixel_sum = -1L,
      embedding = emb)
  }

  /** Decode one media blob: real PNG parse (dims + inflated pixel sum),
    * real GIF LZW decompression (dims + palette-mapped pixel sum), real BMP
    * matrix read (dims + stride-honoring pixel sum), or real JPEG marker
    * walk (dims; entropy data not decoded → pixel_sum -1) when the magic
    * matches. An INVALID image — bad CRC, truncation, lost marker sync —
    * degrades to the stub rather than failing the pipeline, mirroring the
    * dead-letter philosophy. Unknown formats: stub. */
  def decode(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    def sig = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
    def decoded(w: Int, h: Int, pixelSum: Long): MediaFeatures = {
      val px = w.toLong * h
      MediaFeatures(docId, bytes.length.toLong, sig, w, h, pixelSum,
        embedding = Array(
          if (pixelSum >= 0) pixelSum.toFloat / (255.0f * px) else 0.0f, // mean brightness
          w.toFloat / h,                                                 // aspect ratio
          px.toFloat,
          if (pixelSum >= 0) 0.0f else 1.0f))
    }
    if (Png.isPng(bytes)) Png.decode(bytes) match {
      case Some(img) => decoded(img.width, img.height, img.pixelSum)
      case None => decodeStub(docId, bytes)
    }
    else if (Gif.isGif(bytes)) Gif.decode(bytes) match {
      case Some(img) => decoded(img.width, img.height, img.pixelSum)
      case None => decodeStub(docId, bytes)
    }
    else if (Bmp.isBmp(bytes)) Bmp.decode(bytes) match {
      case Some(img) => decoded(img.width, img.height, img.pixelSum)
      case None => decodeStub(docId, bytes)
    }
    else if (Jpeg.isJpeg(bytes)) Jpeg.dims(bytes) match {
      case Some((w, h)) => decoded(w, h, pixelSum = -1L)
      case None => decodeStub(docId, bytes)
    }
    else decodeStub(docId, bytes)
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
        it.map { case (id, bytes) => decode(id, bytes) }
      }
  }

  /** REAL image pipeline (q_multimodal_features): synthesize a valid image
    * per document — PNG / JPEG / GIF / BMP by doc_id % 4, dims + pixels
    * deterministic functions of doc_id — then run the SAME binary-column
    * extraction. PNG dims and pixel sum come out of the actual chunk walk +
    * CRC check + inflate; GIF's out of real LZW decompression; BMP's out of
    * the stride-honoring palette matrix read; JPEG dims out of the actual
    * marker walk. The DuckDB oracle recomputes everything from doc_id
    * (including BMP's file-size-bearing signature bytes), so a mis-parse
    * anywhere in any codec fails the value-level gate. */
  def imageFeaturesOverDocuments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long")).as[Long]
      .repartition(16) // spread encode/decode work; real impl: by size class
      .mapPartitions { it =>
        it.map { id =>
          val w = (id % 40 + 1).toInt
          val h = (id % 30 + 1).toInt
          def pix(x: Int, y: Int): Int = ((x + y + id) % 256).toInt
          val blob = (id % 4) match {
            case 0 => Png.encode(w, h, pix)
            case 1 => Jpeg.encodeSkeleton(w, h)
            case 2 => Gif.encode(w, h, pix)
            case _ => Bmp.encode(w, h, pix)
          }
          (id, blob)
        }
      }.toDF("doc_id", "media")
    extractFeatures(spark, media).toDF()
      .select(col("doc_id"), col("format_sig"), col("width"), col("height"),
        col("pixel_sum"))
  }

  /** Typed row for extracted AUDIO features (WAV/RIFF — the audio
    * modality's real metadata decode). */
  final case class AudioFeatures(
      doc_id: Long,
      n_bytes: Long,
      format_sig: String,
      sample_rate: Int,
      channels: Int,
      bits: Int,
      n_samples: Long,  // per channel
      sample_sum: Long) // exact sum of PCM16 samples (payload traversed)

  /** REAL audio pipeline (q_multimodal_audio): synthesize a valid PCM16
    * WAV per document (rate/channels/length/samples deterministic functions
    * of doc_id), decode through the RIFF chunk walk, and emit fields the
    * DuckDB oracle recomputes from doc_id — including the exact sample sum,
    * so a mis-parse of framing, fmt fields OR payload fails the gate. */
  def audioFeaturesOverDocuments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long")).as[Long]
      .repartition(16)
      .mapPartitions { it =>
        it.map { id =>
          val rate = 8000 + (id % 8).toInt * 1000
          val ch = 1 + (id % 2).toInt
          val n = (id % 50 + 10).toInt
          val bytes = Wav.encode(rate, ch, n,
            i => (((i * 31L + id * 7L) % 4001L) - 2000L).toShort)
          val sig = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
          Wav.decode(bytes) match {
            case Some(a) => AudioFeatures(id, bytes.length.toLong, sig,
              a.sampleRate, a.channels, a.bitsPerSample, a.nSamples, a.sampleSum)
            case None => AudioFeatures(id, bytes.length.toLong, "decode-failed",
              -1, -1, -1, -1L, 0L)
          }
        }
      }.toDF()
  }

  /** Typed row for extracted VIDEO metadata (AVI/RIFF). */
  final case class VideoFeatures(
      doc_id: Long,
      n_bytes: Long,
      format_sig: String,
      width: Int,
      height: Int,
      n_frames: Int,
      fps1000: Long,
      frame_byte_sum: Long)

  /** REAL video-metadata pipeline (q_multimodal_video): synthesize a valid
    * AVI skeleton per document (dims / frame count / frame period / pixel
    * bytes deterministic functions of doc_id), decode through the RIFF/LIST
    * walk, and emit fields DuckDB recomputes — including total byte length
    * (checks the encoder's framing arithmetic) and the frame-payload byte
    * sum (checks the decoder really traversed the movi stream). */
  def videoFeaturesOverDocuments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long")).as[Long]
      .repartition(16)
      .mapPartitions { it =>
        it.map { id =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 3).toInt
          val nf = (id % 6 + 2).toInt
          val us = ((id % 4 + 1) * 20000).toInt
          val bytes = Avi.encode(w, h, nf, us,
            (f, j) => ((id + f * 7L + j * 3L) % 256L).toByte)
          val sig = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
          Avi.decode(bytes) match {
            case Some(v) => VideoFeatures(id, bytes.length.toLong, sig,
              v.width, v.height, v.nFrames, v.fps1000, v.frameByteSum)
            case None => VideoFeatures(id, bytes.length.toLong, "decode-failed",
              -1, -1, -1, -1L, 0L)
          }
        }
      }.toDF()
  }

  /** Demo pipeline used by the byte-level parity query: synthesize a binary
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
