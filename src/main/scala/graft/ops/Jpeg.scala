package graft.ops

import java.nio.ByteBuffer

/** Minimal dependency-free JPEG support: dimension extraction by the real
  * marker walk every metadata tool performs (SOI, segment lengths, SOF*
  * frame headers) — the second REAL multimodal format after [[Png]].
  *
  * Scope is dims-only: entropy-coded pixel data is NOT decoded (a baseline
  * huffman decoder is out of scope for synthetic fixtures), so the encoder
  * emits a structurally valid JFIF skeleton — correct SOI/APP0/SOF0/SOS
  * framing and lengths with placeholder entropy bytes. The PARSER is the
  * real artifact; it works on any actual JPEG.
  */
object Jpeg {

  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff

  /** Walk markers to the first SOF frame header and read (width, height).
    * None on structural corruption (bad marker framing, truncation, no SOF
    * before SOS/EOI). */
  def dims(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (!isJpeg(bytes)) return None
    var pos = 2
    while (pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return None // lost marker sync
      // skip fill bytes (0xFF padding before a marker is legal)
      var p = pos
      while (p < bytes.length && (bytes(p) & 0xff) == 0xff) p += 1
      if (p >= bytes.length) return None
      val marker = bytes(p) & 0xff
      p += 1
      marker match {
        case 0xd8 | 0x01 => pos = p // standalone markers, no length
        case m if m >= 0xd0 && m <= 0xd7 => pos = p // RSTn, standalone
        case 0xd9 => return None // EOI before any SOF
        case 0xda => return None // SOS before any SOF
        case m =>
          if (p + 2 > bytes.length) return None
          val len = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
          if (len < 2 || p + len > bytes.length) return None
          val isSof = (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (len < 7) return None
            val h = ((bytes(p + 3) & 0xff) << 8) | (bytes(p + 4) & 0xff)
            val w = ((bytes(p + 5) & 0xff) << 8) | (bytes(p + 6) & 0xff)
            return if (w > 0 && h > 0) Some((w, h)) else None
          }
          pos = p + len
      }
    }
    None
  }

  /** Structurally valid JFIF skeleton fixture with the given dims:
    * SOI + APP0("JFIF") + SOF0(8-bit, 1 component) + SOS + 4 placeholder
    * entropy bytes + EOI. Correct lengths and framing; pixel data fake. */
  def encodeSkeleton(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff)
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Byte]): Unit = {
      marker(m)
      out.write(ByteBuffer.allocate(2).putShort((payload.length + 2).toShort).array())
      out.write(payload)
    }
    marker(0xd8) // SOI
    seg(0xe0, "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 2, 0, 0, 1, 0, 1, 0, 0))
    seg(0xc0, Array[Byte](8) ++ // precision
      ByteBuffer.allocate(2).putShort(height.toShort).array() ++
      ByteBuffer.allocate(2).putShort(width.toShort).array() ++
      Array[Byte](1, 1, 0x11, 0)) // 1 component, 1:1 sampling, q-table 0
    seg(0xda, Array[Byte](1, 1, 0, 0, 63, 0)) // SOS header, 1 component
    out.write(Array[Byte](0x12, 0x34, 0x56, 0x78)) // placeholder entropy
    marker(0xd9) // EOI
    out.toByteArray
  }
}
