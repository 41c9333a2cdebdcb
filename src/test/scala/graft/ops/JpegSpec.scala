package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class JpegSpec extends AnyFunSuite {

  test("marker walk reads SOF0 dims from skeleton fixtures of assorted sizes") {
    for ((w, h) <- Seq((1, 1), (40, 30), (640, 480), (65535, 1), (13, 7))) {
      val bytes = Jpeg.encodeSkeleton(w, h)
      assert(Jpeg.isJpeg(bytes))
      assert(Jpeg.dims(bytes).contains((w, h)), s"dims mismatch for ${w}x$h")
    }
  }

  test("dims survives extra leading segments (walker skips non-SOF markers by length)") {
    // splice an extra COM segment between APP0 and SOF0
    val base = Jpeg.encodeSkeleton(20, 10)
    val app0End = 2 + 2 + 16 // SOI + APP0 marker + APP0 payload(len 16)
    val comment = Array[Byte](0xff.toByte, 0xfe.toByte, 0, 9) ++ "comment".getBytes
    val spliced = base.take(app0End) ++ comment ++ base.drop(app0End)
    assert(Jpeg.dims(spliced).contains((20, 10)))
  }

  test("truncation, lost sync, SOS-before-SOF and garbage are rejected") {
    val good = Jpeg.encodeSkeleton(20, 10)
    assert(Jpeg.dims(good.take(6)).isEmpty)            // truncated in APP0
    val desync = good.clone(); desync(2) = 0x00        // APP0 marker byte smashed
    assert(Jpeg.dims(desync).isEmpty)
    assert(Jpeg.dims("FFD8 but not really".getBytes).isEmpty)
    assert(!Jpeg.isJpeg(Array[Byte](0x00, 0x01)))
    // a stream whose SOF was replaced by a same-length COM never yields dims
    val noSof = good.clone()
    val sofAt = 2 + 2 + 16 // first byte of the SOF marker
    noSof(sofAt + 1) = 0xfe.toByte
    assert(Jpeg.dims(noSof).isEmpty)
  }

  test("Multimodal.decode: real dims for JPEG, pixel_sum -1, stub on corrupt") {
    val f = Multimodal.decode(3L, Jpeg.encodeSkeleton(33, 22))
    assert(f.width == 33 && f.height == 22)
    assert(f.pixel_sum == -1L && f.format_sig == "ffd8ffe0")
    assert(f.embedding(1) == 33.0f / 22.0f)

    val corrupt = Jpeg.encodeSkeleton(33, 22).take(6).toArray
    val g = Multimodal.decode(4L, corrupt ++ Array[Byte](0, 0))
    // degraded to the stub (deterministic fake), never an exception
    assert(g.n_bytes == 8L)
  }
}
