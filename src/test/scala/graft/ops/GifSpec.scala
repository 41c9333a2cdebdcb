package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class GifSpec extends AnyFunSuite {

  private def expectedSum(w: Int, h: Int, pix: (Int, Int) => Int): Long =
    (for (y <- 0 until h; x <- 0 until w) yield (pix(x, y) & 0xff).toLong).sum

  test("encode → decode round-trips dims and pixel sum through real LZW") {
    val pix = (x: Int, y: Int) => (x + y * 3 + 7) % 256
    for ((w, h) <- Seq((1, 1), (40, 30), (13, 7), (1, 25), (25, 1), (64, 64))) {
      val bytes = Gif.encode(w, h, pix)
      assert(Gif.isGif(bytes))
      val img = Gif.decode(bytes).getOrElse(fail(s"decode failed for ${w}x$h"))
      assert(img.width == w && img.height == h)
      assert(img.pixelSum == expectedSum(w, h, pix), s"pixel sum for ${w}x$h")
    }
  }

  test("uniform image exercises the KwKwK code path") {
    // runs of one value make the encoder emit codes it just defined —
    // the decoder must handle code == next (entry not yet in its table)
    for (v <- Seq(0, 7, 255)) {
      val img = Gif.decode(Gif.encode(10, 10, (_, _) => v)).get
      assert(img.pixelSum == 100L * v)
    }
  }

  test("high-entropy image exercises width bumps and dictionary-full reset") {
    // LCG pixels defeat the dictionary: ~1 add per pixel, so 90000 pixels
    // drive the code width through 10/11/12 bits and past the 4096-entry
    // ceiling, forcing the mid-stream clear-and-reset path on both sides
    var seed = 12345L
    val rnd = Array.fill(300 * 300) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) & 0xff).toInt
    }
    val pix = (x: Int, y: Int) => rnd(y * 300 + x)
    val img = Gif.decode(Gif.encode(300, 300, pix)).getOrElse(fail("decode failed"))
    assert(img.width == 300 && img.height == 300)
    assert(img.pixelSum == rnd.map(_.toLong).sum)
  }

  test("structural corruption is rejected") {
    val good = Gif.encode(20, 10, (x, y) => x * y % 256)
    assert(Gif.decode(good.take(50)).isEmpty)          // truncated in palette
    assert(Gif.decode(good.dropRight(1)).isEmpty)      // missing trailer
    assert(Gif.decode(good.dropRight(12)).isEmpty)     // truncated LZW data
    val badSig = good.clone(); badSig(0) = 'X'.toByte
    assert(Gif.decode(badSig).isEmpty)
    assert(!Gif.isGif("GIF99a".getBytes))
    // lie about height in the image descriptor: LZW pixel count mismatch.
    // descriptor starts after header(6)+LSD(7)+palette(768) at 781;
    // height is the LE16 at descriptor offset 7
    val lied = good.clone()
    lied(781 + 7) = 11.toByte
    assert(Gif.decode(lied).isEmpty, "pixel-count mismatch must be rejected")
  }

  test("Multimodal.decode: real dims and pixel sum for GIF, stub on corrupt") {
    val pix = (x: Int, y: Int) => (x + y) % 256
    val f = Multimodal.decode(5L, Gif.encode(17, 9, pix))
    assert(f.width == 17 && f.height == 9)
    assert(f.pixel_sum == expectedSum(17, 9, pix))
    assert(f.format_sig == "47494638")
    val broken = Gif.encode(17, 9, pix).dropRight(3)
    assert(Multimodal.decode(5L, broken).pixel_sum == -1L) // stub path
  }
}
