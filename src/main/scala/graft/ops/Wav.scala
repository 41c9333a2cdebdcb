package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal dependency-free WAV (RIFF/PCM) codec — the AUDIO modality's real
  * metadata decode, same class as [[Png]]/[[Jpeg]]: RIFF framing walk,
  * fmt-chunk field extraction, data-chunk accounting, plus the exact sum of
  * 16-bit samples as the cheap "feature" proving the payload was really
  * traversed (not just the header).
  */
object Wav {

  /** Decoded audio: format fields + sample count + exact sample sum. */
  final case class Audio(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      nSamples: Long, // per channel
      sampleSum: Long)

  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes.startsWith("RIFF".getBytes("US-ASCII")) &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE"

  /** Encode PCM16 mono/stereo with sample `i` (interleaved index) given by
    * `sample(i)` — a fully valid RIFF/WAVE file. */
  def encode(sampleRate: Int, channels: Int, nSamplesPerChannel: Int,
      sample: Int => Short): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nSamplesPerChannel > 0)
    val nInterleaved = nSamplesPerChannel * channels
    val dataLen = nInterleaved * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until nInterleaved).foreach(i => buf.putShort(sample(i)))
    buf.array()
  }

  /** Strict decode: None on anything that is not a well-formed 16-bit PCM
    * RIFF/WAVE (bad framing, truncated chunk, missing fmt/data, short data,
    * non-PCM, odd bit depth). */
  def decode(bytes: Array[Byte]): Option[Audio] = {
    if (!isWav(bytes)) return None
    try {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var fmt: Option[(Int, Int, Int)] = None // (rate, channels, bits)
      var audio: Option[Audio] = None
      while (pos + 8 <= bytes.length && audio.isEmpty) {
        val kind = new String(bytes, pos, 4, "US-ASCII")
        val len = bb.getInt(pos + 4)
        if (len < 0 || pos + 8 + len > bytes.length) return None
        kind match {
          case "fmt " =>
            if (len < 16) return None
            val audioFormat = bb.getShort(pos + 8) & 0xffff
            val channels = bb.getShort(pos + 10) & 0xffff
            val rate = bb.getInt(pos + 12)
            val bits = bb.getShort(pos + 22) & 0xffff
            if (audioFormat != 1 || bits != 16 || channels == 0 || rate <= 0)
              return None // PCM16 only
            fmt = Some((rate, channels, bits))
          case "data" =>
            val (rate, channels, bits) = fmt.getOrElse(return None)
            if (len % (channels * 2) != 0) return None
            val nInterleaved = len / 2
            var sum = 0L
            var i = 0
            while (i < nInterleaved) {
              sum += bb.getShort(pos + 8 + 2 * i).toLong
              i += 1
            }
            audio = Some(Audio(rate, channels, bits,
              nSamples = nInterleaved.toLong / channels, sampleSum = sum))
          case _ => () // ancillary chunk (LIST, fact, ...): skipped by length
        }
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
      audio
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
