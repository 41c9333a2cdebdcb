package graft.ops

/** Minimal dependency-free BMP codec — fourth REAL image format. 8-bpp
  * palette (BITMAPINFOHEADER, BI_RGB) with the grayscale identity palette:
  * the full uncompressed pixel matrix is written and read back, so the
  * decoder exercises everything a real BMP reader must get right — BGRX
  * palette indirection, 4-byte row padding (pad bytes are written non-zero
  * so a naive whole-buffer sum is caught), bottom-up vs top-down row order,
  * and file/offset arithmetic cross-checked against the actual length.
  */
object Bmp {

  final case class Image(width: Int, height: Int, pixelSum: Long)

  def isBmp(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte

  private def rowSize(width: Int): Int = (width + 3) & ~3

  /** Encode a width×height 8-bpp bottom-up BMP whose pixel at (x, y) is
    * `pixel(x, y) & 0xff` over an identity grayscale palette. Row padding
    * is filled with 0xAA — legal (pad content is unspecified) and chosen to
    * poison decoders that sum raw rows without honoring the row stride. */
  def encode(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val stride = rowSize(width)
    val offBits = 14 + 40 + 256 * 4
    val fileSize = offBits + stride * height
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(fileSize).putInt(0).putInt(offBits)
    b.putInt(40).putInt(width).putInt(height) // positive height: bottom-up
    b.putShort(1).putShort(8)                 // planes, bpp
    b.putInt(0)                               // BI_RGB
    b.putInt(stride * height)                 // image size
    b.putInt(2835).putInt(2835)               // 72 dpi
    b.putInt(256).putInt(0)                   // colors used / important
    (0 until 256).foreach { i =>              // palette entries are BGRX
      b.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte)
    }
    ((height - 1) to 0 by -1).foreach { y =>  // bottom-up row order
      (0 until width).foreach(x => b.put((pixel(x, y) & 0xff).toByte))
      (width until stride).foreach(_ => b.put(0xaa.toByte))
    }
    b.array()
  }

  /** Strict decode: None unless an uncompressed 8-bpp BITMAPINFOHEADER BMP
    * whose declared file size, pixel offset and image extent all agree with
    * the actual byte count. Accepts negative (top-down) heights. Pixel sum
    * goes through the palette's R channel, honoring the row stride. */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (!isBmp(bytes) || bytes.length < 14 + 40) return None
    try {
      val b = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val fileSize = b.getInt(2)
      val offBits = b.getInt(10)
      if (fileSize != bytes.length) return None
      if (b.getInt(14) != 40) return None // header version: BITMAPINFOHEADER
      val width = b.getInt(18)
      val rawHeight = b.getInt(22)
      if (rawHeight == Int.MinValue) return None // abs() would stay negative
      val height = math.abs(rawHeight)
      if (width <= 0 || height == 0) return None
      if (b.getShort(26) != 1 || b.getShort(28) != 8) return None
      if (b.getInt(30) != 0) return None // compression: BI_RGB only
      val clrUsed = b.getInt(46)
      val nColors = if (clrUsed == 0) 256 else clrUsed
      if (nColors < 1 || nColors > 256) return None
      val palAt = 14 + 40
      if (palAt + nColors * 4 > offBits || offBits > bytes.length) return None
      val palR = Array.tabulate(nColors)(i => bytes(palAt + i * 4 + 2) & 0xff)
      val stride = rowSize(width)
      if (offBits + stride.toLong * height > bytes.length) return None
      var sum = 0L
      var y = 0
      while (y < height) {
        val row = offBits + y * stride
        var x = 0
        while (x < width) {
          val idx = bytes(row + x) & 0xff
          if (idx >= nColors) return None
          sum += palR(idx)
          x += 1
        }
        y += 1
      }
      Some(Image(width, height, sum))
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
