package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class BmpSpec extends AnyFunSuite {

  private def expectedSum(w: Int, h: Int, pix: (Int, Int) => Int): Long =
    (for (y <- 0 until h; x <- 0 until w) yield (pix(x, y) & 0xff).toLong).sum

  test("encode → decode round-trips dims and pixel sum across stride paddings") {
    val pix = (x: Int, y: Int) => (x * 5 + y * 11 + 3) % 256
    // widths cover all four w % 4 padding cases — pads are 0xAA, so a
    // decoder that sums raw row bytes without honoring the stride fails
    for ((w, h) <- Seq((1, 1), (2, 9), (3, 5), (4, 4), (40, 30), (13, 7))) {
      val bytes = Bmp.encode(w, h, pix)
      assert(Bmp.isBmp(bytes))
      val img = Bmp.decode(bytes).getOrElse(fail(s"decode failed for ${w}x$h"))
      assert(img.width == w && img.height == h)
      assert(img.pixelSum == expectedSum(w, h, pix), s"pixel sum for ${w}x$h")
    }
  }

  test("top-down (negative height) BMPs decode with the same sum") {
    val pix = (x: Int, y: Int) => (x + y * 2) % 256
    val bytes = Bmp.encode(6, 4, pix)
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(22, -4) // flip to top-down; row order changes, the sum doesn't
    val img = Bmp.decode(bytes).getOrElse(fail("top-down decode failed"))
    assert(img.width == 6 && img.height == 4)
    assert(img.pixelSum == expectedSum(6, 4, pix))
  }

  test("structural corruption is rejected") {
    val good = Bmp.encode(10, 8, (x, y) => x + y)
    assert(Bmp.decode(good.dropRight(1)).isEmpty)  // declared size ≠ actual
    assert(Bmp.decode(good.take(30)).isEmpty)      // truncated header
    val bpp24 = good.clone()
    java.nio.ByteBuffer.wrap(bpp24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(28, 24)
    assert(Bmp.decode(bpp24).isEmpty, "only 8-bpp is supported")
    val rle = good.clone()
    java.nio.ByteBuffer.wrap(rle).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(30, 1) // BI_RLE8
    assert(Bmp.decode(rle).isEmpty, "compressed BMPs are rejected")
    val fewColors = good.clone()
    java.nio.ByteBuffer.wrap(fewColors).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(46, 4) // claim a 4-entry palette: pixel indices overflow it
    assert(Bmp.decode(fewColors).isEmpty, "palette-overflowing index rejected")
    assert(!Bmp.isBmp(Array[Byte](0x42, 0x00)))
  }

  test("Multimodal.decode: real dims and pixel sum for BMP, stub on corrupt") {
    val pix = (x: Int, y: Int) => (x * 3 + y) % 256
    val blob = Bmp.encode(9, 5, pix)
    val f = Multimodal.decode(7L, blob)
    assert(f.width == 9 && f.height == 5)
    assert(f.pixel_sum == expectedSum(9, 5, pix))
    // signature carries the file size: 14+40+1024 + stride(12)*5 = 1138
    assert(f.format_sig == "424d" + f"${blob.length & 0xff}%02x${(blob.length >> 8) & 0xff}%02x")
    assert(blob.length == 1138)
    assert(Multimodal.decode(7L, blob.dropRight(2)).pixel_sum == -1L) // stub path
  }
}
