package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Mutation fuzz over every media decoder: random byte flips, truncations
  * and splices of valid fixtures must always return (a decode or the stub)
  * — never throw, never hang. The PNG preset-dictionary spin found by
  * review was exactly this class of bug; this pins the whole family.
  * Deterministic LCG so failures replay. */
class CodecFuzzSpec extends AnyFunSuite {

  private final class Lcg(var s: Long) {
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 11 }
    def int(n: Int): Int = ((next() >>> 8) % n).toInt
  }

  private def fixtures: Seq[(String, Array[Byte])] = Seq(
    "png" -> Png.encode(24, 17, (x, y) => (x * 3 + y) % 256),
    "gif" -> Gif.encode(24, 17, (x, y) => (x + y * 5) % 256),
    "bmp" -> Bmp.encode(23, 9, (x, y) => (x + y) % 256), // stride-padded width
    "jpeg" -> Jpeg.encodeSkeleton(24, 17),
    "wav" -> Wav.encode(16000, 2, 40, i => (i * 13 - 300).toShort),
    "avi" -> Avi.encode(12, 9, 3, 40000, (f, j) => ((f + j) % 256).toByte)
  )

  private def mutate(rnd: Lcg, base: Array[Byte]): Array[Byte] =
    rnd.int(4) match {
      case 0 => // flip 1-4 random bytes
        val b = base.clone()
        (0 to rnd.int(4)).foreach { _ =>
          val i = rnd.int(b.length); b(i) = (b(i) ^ (1 << rnd.int(8))).toByte
        }
        b
      case 1 => base.take(rnd.int(base.length)) // truncate
      case 2 => // splice a random chunk over a random offset
        val b = base.clone()
        val off = rnd.int(b.length)
        val len = math.min(rnd.int(16) + 1, b.length - off)
        (0 until len).foreach(i => b(off + i) = rnd.int(256).toByte)
        b
      case _ => // duplicate a slice onto the tail (length lies)
        val cut = rnd.int(base.length)
        base ++ base.slice(cut, math.min(base.length, cut + rnd.int(64) + 1))
    }

  test("500 mutations per format: decode always returns, never throws") {
    fixtures.foreach { case (name, good) =>
      val rnd = new Lcg(0x5eed + name.hashCode)
      var survived = 0
      (0 until 500).foreach { i =>
        val bytes = mutate(rnd, good)
        // any of the typed decoders may be hit depending on surviving magic
        val f = Multimodal.decode(i.toLong, bytes)
        assert(f != null)
        // exercise the format-specific strict decoders directly too (the
        // Multimodal dispatch only routes image magics); count survivors
        // per the format's OWN decoder so the tally isn't conflated with
        // the stub's fake dims
        val ok = name match {
          case "png" => Png.decode(bytes).isDefined
          case "gif" => Gif.decode(bytes).isDefined
          case "bmp" => Bmp.decode(bytes).isDefined
          case "jpeg" => Jpeg.dims(bytes).isDefined
          case "wav" => Wav.decode(bytes).isDefined
          case _ => Avi.decode(bytes).isDefined
        }
        if (ok) survived += 1
      }
      info(s"$name: $survived/500 mutants still decode strictly, rest rejected cleanly")
    }
  }

  test("empty and tiny inputs are safe across all decoders") {
    for (n <- 0 to 16) {
      val bytes = Array.fill(n)(0x42.toByte)
      Multimodal.decode(0L, bytes)
      assert(Png.decode(bytes).isEmpty && Gif.decode(bytes).isEmpty &&
        Bmp.decode(bytes).isEmpty && Jpeg.dims(bytes).isEmpty &&
        Wav.decode(bytes).isEmpty && Avi.decode(bytes).isEmpty)
    }
  }
}
