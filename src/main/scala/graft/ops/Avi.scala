package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal dependency-free AVI (RIFF) support — the VIDEO modality's real
  * metadata decode: RIFF/LIST framing walk, `avih` main-header fields
  * (frame period, frame count, dimensions), `movi` frame-chunk accounting
  * with a byte-sum over the frame payloads proving the stream was actually
  * traversed. Encoder emits a valid uncompressed-gray skeleton (RIFF
  * framing and header fields exact; frame payloads raw bytes). */
object Avi {

  /** Decoded video metadata. `fps1000` = frames/sec × 1000 (exact from the
    * microseconds-per-frame header field). */
  final case class Video(
      width: Int,
      height: Int,
      nFrames: Int,
      fps1000: Long,
      frameByteSum: Long)

  def isAvi(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes.startsWith("RIFF".getBytes("US-ASCII")) &&
      new String(bytes, 8, 4, "US-ASCII") == "AVI "

  /** Encode a skeleton AVI: RIFF('AVI ') → LIST(hdrl → avih) →
    * LIST(movi → nFrames × '00db' chunks of width×height gray bytes, the
    * byte at (frame f, offset j) given by `pix(f, j)`). */
  def encode(width: Int, height: Int, nFrames: Int, usPerFrame: Int,
      pix: (Int, Int) => Byte): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0 && usPerFrame > 0)
    val frameLen = width * height
    def chunk(tag: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length + (payload.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(tag.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      b.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes("US-ASCII")).putInt(4 + body.length)
        .put(kind.getBytes("US-ASCII")).put(body)
      b.array()
    }
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
      .putInt(nFrames).putInt(0).putInt(1).putInt(frameLen)
      .putInt(width).putInt(height)
      .array() // 4 reserved dwords stay zero
    val hdrl = list("hdrl", chunk("avih", avih))
    val frames = (0 until nFrames).toArray.flatMap { f =>
      chunk("00db", Array.tabulate(frameLen)(j => pix(f, j)))
    }
    val movi = list("movi", frames)
    val body = hdrl ++ movi
    val out = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("AVI ".getBytes("US-ASCII")).put(body)
    out.array()
  }

  /** Strict decode: None on bad RIFF framing, missing/short avih, frame
    * count disagreeing with the header, or truncation anywhere. */
  def decode(bytes: Array[Byte]): Option[Video] = {
    if (!isAvi(bytes)) return None
    try {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      var header: Option[(Int, Int, Int, Long)] = None // (w, h, frames, fps1000)
      var seen = 0
      var sum = 0L

      def walk(pos0: Int, end: Int): Boolean = { // false = structural error
        var pos = pos0
        while (pos + 8 <= end) {
          val tag = new String(bytes, pos, 4, "US-ASCII")
          val len = bb.getInt(pos + 4)
          if (len < 0 || pos + 8 + len > end) return false
          tag match {
            case "LIST" =>
              if (len < 4) return false
              if (!walk(pos + 12, pos + 8 + len)) return false
            case "avih" =>
              if (len < 56) return false
              val us = bb.getInt(pos + 8)
              if (us <= 0) return false
              header = Some((bb.getInt(pos + 40), bb.getInt(pos + 44),
                bb.getInt(pos + 24), 1000000000L / us))
            case t if t == "00db" || t == "00dc" =>
              seen += 1
              var j = 0
              while (j < len) { sum += (bytes(pos + 8 + j) & 0xff).toLong; j += 1 }
            case _ => ()
          }
          pos += 8 + len + (len & 1)
        }
        true
      }

      if (!walk(12, bytes.length)) return None
      header match {
        case Some((w, h, n, fps)) if w > 0 && h > 0 && n == seen =>
          Some(Video(w, h, n, fps, sum))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
