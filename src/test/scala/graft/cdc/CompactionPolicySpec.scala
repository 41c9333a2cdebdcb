package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.DataFileMeta

/** Rewrite-amplification contract of the size-tiered compaction policy
  * ([[LakeMerge.tieredPlan]]), checked by SIMULATION over 10^4 batches (the
  * policy function is pure, so no Spark jobs are needed — which is what
  * makes a 10^4-batch horizon testable at all):
  *
  * under a steady delta trickle into one bucket, total bytes rewritten by
  * compaction must grow O(data · log batches): a Major at ratio 1.0 at
  * least doubles the base (O(log) majors per byte), and Minors merge only
  * the SMALLEST half of the delta files, so consolidated deltas tier
  * geometrically (O(log) minors per byte between majors). A flat
  * "full rewrite every k deltas" trigger — round 1's policy — rewrites the
  * ever-growing base every k batches: O(batches²/k) total bytes.
  *
  * Correct LWW behavior of the compaction itself (including the
  * tiered-policy path wired into CdcStream) is covered by
  * MergePropertiesSpec / CdcStreamSpec; this spec isolates the COST model.
  */
class CompactionPolicySpec extends AnyFunSuite {

  /** Simulate one bucket under a policy that returns, per step, which delta
    * files to fold and whether the base is included (major). `growth` is
    * the fraction of folded delta bytes that survives into the new base
    * (1.0 = pure inserts). Returns (ingested, rewritten) byte totals. */
  private def simulate(
      batches: Int,
      deltaBytes: Long,
      growth: Double,
      plan: Seq[DataFileMeta] => Option[LakeMerge.CompactAction]
  ): (Long, Long) = {
    var base = 0L
    var deltas = Vector.empty[Long]
    var ingested = 0L
    var rewritten = 0L
    (0 until batches).foreach { _ =>
      deltas :+= deltaBytes
      ingested += deltaBytes
      val files =
        (if (base > 0) Seq(DataFileMeta("b", 0, base, 0, "base")) else Nil) ++
          deltas.zipWithIndex.map { case (sz, i) => DataFileMeta(s"d$i", 0, sz, 0, "delta") }
      plan(files) match {
        case Some(LakeMerge.Major()) =>
          base = base + (deltas.sum * growth).toLong
          rewritten += base
          deltas = Vector.empty
        case Some(LakeMerge.Minor(sel)) =>
          val selSizes = sel.map(_.bytes)
          val merged = selSizes.sum // upserts across files are rare in a trickle
          rewritten += merged
          deltas = deltas.diff(selSizes.toVector) :+ merged
        case None => ()
      }
    }
    (ingested, rewritten)
  }

  private def tiered(files: Seq[DataFileMeta]): Option[LakeMerge.CompactAction] =
    LakeMerge.tieredPlan(files, sizeRatio = 1.0, maxDeltaFiles = 16).get(0)

  private def flatEvery(k: Int)(files: Seq[DataFileMeta]): Option[LakeMerge.CompactAction] =
    if (files.count(_.kind == "delta") >= k) Some(LakeMerge.Major()) else None

  test("tiered policy: rewrite amplification is logarithmic in batch count") {
    // amp ≈ major term (sum of doubled bases ≈ 2-4× data) + minor term
    // (≤ log2(base/batch) tier levels) — both O(log batches); measured
    // ~22 at 10^4 batches vs 625 for the flat trigger
    val batches = 10000
    val (ingested, rewritten) = simulate(batches, deltaBytes = 1000L, growth = 1.0, tiered)
    val amp = rewritten.toDouble / ingested
    val logBound = 2.0 * math.log(batches.toDouble) / math.log(2.0) // ≈ 26.6
    assert(amp <= logBound,
      s"tiered amplification $amp exceeded 2·log2(batches)=$logBound")

    // growth check: 4× more batches must add only an additive O(1) to the
    // amplification (log growth), not multiply it (the flat trigger's
    // amplification ~quadruples: ~156 → ~625 over the same span)
    val (ing2, rw2) = simulate(batches / 4, 1000L, 1.0, tiered)
    val ampSmall = rw2.toDouble / ing2
    assert(amp - ampSmall <= 6.0,
      s"amplification not logarithmic: $ampSmall @${batches / 4} → $amp @$batches")
  }

  test("tiered policy beats the flat every-k trigger by an unbounded factor") {
    // at 10^4 batches the flat-8 trigger has rewritten the ever-growing
    // base ~1250 times → amplification ~ batches/(2·8); tiered stays ~log
    val batches = 10000
    val (ing1, tieredRw) = simulate(batches, 1000L, 1.0, tiered)
    val (ing2, flatRw) = simulate(batches, 1000L, 1.0, flatEvery(8))
    assert(ing1 == ing2)
    val tieredAmp = tieredRw.toDouble / ing1
    val flatAmp = flatRw.toDouble / ing2
    assert(flatAmp / tieredAmp > 20.0,
      s"expected order-of-magnitude separation: tiered=$tieredAmp flat=$flatAmp")
  }

  test("read-amplification cap: delta files between compactions stay bounded") {
    // pure churn of existing keys (growth 0) into a bucket whose base
    // dwarfs the trickle: the size trigger alone would wait ~base bytes;
    // the file-count cap must keep pending delta files bounded via minors
    var base = 50000000L
    var deltas = Vector.empty[Long]
    var maxPending = 0
    (0 until 1000).foreach { _ =>
      deltas :+= 1000L
      maxPending = math.max(maxPending, deltas.size)
      val files = Seq(DataFileMeta("b", 0, base, 0, "base")) ++
        deltas.zipWithIndex.map { case (sz, i) => DataFileMeta(s"d$i", 0, sz, 0, "delta") }
      LakeMerge.tieredPlan(files, 1.0, 16).get(0) match {
        case Some(LakeMerge.Minor(sel)) =>
          val selSizes = sel.map(_.bytes)
          deltas = deltas.diff(selSizes.toVector) :+ selSizes.sum
        case Some(LakeMerge.Major()) =>
          base += deltas.sum; deltas = Vector.empty
        case None => ()
      }
    }
    // pending may exceed the trigger by the number of occupied size tiers
    // (O(log) — the standard LSM read-amplification tradeoff), never linearly
    assert(maxPending <= 24, s"read amplification unbounded: $maxPending delta files pending")
  }
}
