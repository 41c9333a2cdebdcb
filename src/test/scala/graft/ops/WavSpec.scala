package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class WavSpec extends AnyFunSuite {

  private def tone(i: Int): Short = ((i * 131) % 3000 - 1500).toShort

  test("encode → decode round-trips format fields, sample count and sample sum") {
    for ((rate, ch, n) <- Seq((8000, 1, 10), (44100, 2, 333), (16000, 2, 1), (11025, 1, 4096))) {
      val bytes = Wav.encode(rate, ch, n, tone)
      assert(Wav.isWav(bytes))
      val a = Wav.decode(bytes).getOrElse(fail(s"decode failed for $rate/$ch/$n"))
      assert(a.sampleRate == rate && a.channels == ch && a.bitsPerSample == 16)
      assert(a.nSamples == n)
      assert(a.sampleSum == (0 until n * ch).map(tone(_).toLong).sum)
    }
  }

  test("ancillary chunks are skipped by length; truncation and non-PCM are rejected") {
    val base = Wav.encode(8000, 1, 20, tone)
    // splice a LIST chunk between WAVE header and fmt
    val list = "LIST".getBytes ++ Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes
    val spliced = base.take(12) ++ list ++ base.drop(12)
    assert(Wav.decode(spliced).exists(_.nSamples == 20))

    assert(Wav.decode(base.take(30)).isEmpty)  // truncated in fmt
    assert(Wav.decode(base.dropRight(3)).isEmpty) // truncated data
    val nonPcm = base.clone(); nonPcm(20) = 3 // audioFormat = IEEE float
    assert(Wav.decode(nonPcm).isEmpty)
    assert(Wav.decode("RIFFxxxxWAVE".getBytes).isEmpty) // no chunks
    assert(!Wav.isWav("RIFFxxxxAVI ".getBytes))
  }
}
