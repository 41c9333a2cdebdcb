package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class PngSpec extends AnyFunSuite {

  private def px(x: Int, y: Int): Int = (x * 7 + y * 13) % 256

  test("encode → decode round-trips dims and pixel sum for assorted sizes") {
    for ((w, h) <- Seq((1, 1), (3, 7), (40, 30), (128, 1), (1, 200), (255, 17))) {
      val bytes = Png.encode(w, h, px)
      assert(Png.isPng(bytes))
      val img = Png.decode(bytes).getOrElse(fail(s"decode failed for ${w}x$h"))
      assert(img.width == w && img.height == h)
      val expected = (for (y <- 0 until h; x <- 0 until w) yield px(x, y).toLong).sum
      assert(img.pixelSum == expected, s"pixel sum mismatch for ${w}x$h")
    }
  }

  test("a flipped content byte breaks the chunk CRC and is rejected") {
    val bytes = Png.encode(16, 16, px)
    // corrupt one IDAT payload byte (skip signature+IHDR: offset 8+25+8)
    val corrupted = bytes.clone()
    corrupted(8 + 25 + 8 + 2) = (corrupted(8 + 25 + 8 + 2) ^ 0x40).toByte
    assert(Png.decode(corrupted).isEmpty)
  }

  test("truncated / garbage / non-PNG inputs are rejected, never throw") {
    val good = Png.encode(8, 8, px)
    assert(Png.decode(good.take(20)).isEmpty)       // truncated mid-IHDR
    assert(Png.decode(good.dropRight(6)).isEmpty)   // truncated tail
    assert(Png.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Png.decode("not a png at all".getBytes).isEmpty)
    assert(!Png.isPng("text".getBytes))
  }

  test("a zlib stream demanding a preset dictionary is rejected, not spun on") {
    // CRC-valid chunks around an IDAT whose zlib header sets FDICT
    // (0x78 0xBB: check bits valid, dictionary bit on): Inflater makes no
    // progress (needsDictionary) — decode must return None, never hang
    def chunk(kind: String, data: Array[Byte]): Array[Byte] = {
      val tag = kind.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32(); crc.update(tag); crc.update(data)
      java.nio.ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(tag).put(data).putInt(crc.getValue.toInt).array()
    }
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(2).putInt(2)
      .put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    val fdictIdat = Array(0x78, 0xbb, 0x01, 0x02, 0x03, 0x04, 0x05).map(_.toByte)
    val png = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", fdictIdat) ++
      chunk("IEND", Array.emptyByteArray)
    assert(Png.decode(png).isEmpty)
  }

  test("Multimodal.decode: real features for PNG, stub fallback otherwise") {
    val png = Png.encode(10, 4, (x, y) => 100)
    val f = Multimodal.decode(7L, png)
    assert(f.width == 10 && f.height == 4)
    assert(f.pixel_sum == 100L * 10 * 4)
    assert(f.format_sig == "89504e47")
    assert(math.abs(f.embedding(0) - 100.0f / 255.0f) < 1e-5)

    val notPng = Multimodal.decode(8L, "plain bytes".getBytes)
    assert(notPng.pixel_sum == -1L)

    // an invalid PNG (corrupt CRC) degrades to the stub, never fails
    val bad = png.clone(); bad(bad.length - 5) = 0x55
    assert(Multimodal.decode(9L, bad).pixel_sum == -1L)
  }
}
