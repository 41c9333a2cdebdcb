package graft.lake

import java.nio.file.{Files, Paths}
import scala.collection.mutable.ArrayBuffer

import graft.SparkSpec
import graft.cdc.CdcStream

/** Metadata-depth soak (VERDICT r5 #5): a 10^10-event deployment implies
  * 10^4–10^5 commits on one table. This spec drives the METADATA layer
  * through 2000 commits in seconds (fabricated file metas — appendCommit /
  * rewriteCommit / expireSnapshots never open data files) and asserts the
  * properties that keep commit cost flat at that depth:
  *
  *  - snapshot JSON size PLATEAUS (manifest-list merging keeps the
  *    manifest list O(log files) per group; expiration bounds fences);
  *  - total manifest count stays under the per-group backstop;
  *  - per-bucket file count stays bounded under the production
  *    minor-compaction cadence;
  *  - commit wall time stays flat from the 10th percentile of the run to
  *    the last.
  *
  * The REAL-data twin is [[graft.SoakMeta]] (10^4 live mergeBatch commits,
  * curve recorded in BASELINE.md). */
class SoakMetaSpec extends SparkSpec {

  test("2000-commit metadata depth: snapshot bytes plateau, manifests bounded, flat commit wall") {
    val root = tmpDir("soakmeta")
    val t = LakeTable.create(spark, root, CdcStream.binlogSchema, numBuckets = 8)
    val N = 2000
    val CompactEvery = 100
    val Retain = 50

    def fab(i: Int, b: Int, kind: String) = DataFileMeta(
      s"$root/data/fab-$i-$b.parquet", b, 4096L, 0, kind = kind,
      minLsn = i.toLong * 10, maxLsn = i.toLong * 10 + 9, rows = 10L)

    val walls = new ArrayBuffer[Double]
    var bytesAtQuarter = 0L
    (1 to N).foreach { i =>
      val t0 = System.nanoTime()
      t.appendCommit(Seq(fab(i, i % 8, "delta"), fab(i, (i + 3) % 8, "delta")),
        fence = Some(("soak", i.toLong)),
        summary = Map("operation" -> "merge-append"))
      walls += (System.nanoTime() - t0) / 1e6
      if (i % CompactEvery == 0) {
        // production cadence: fold each bucket's deltas into one base
        // (metadata-only emulation of minor compaction) + expire history
        (0 until 8).foreach { b =>
          val deltas = t.filesOf(t.snapshot, Set(b)).filter(_.kind == "delta")
          if (deltas.size >= 4) {
            t.rewriteCommit(Set(b), deltas.map(_.path).toSet,
              Seq(fab(1000000 + i, b, "base")))
            ()
          }
        }
        t.expireSnapshots(retainLast = Retain)
        ()
      }
      if (i == N / 4)
        bytesAtQuarter = Files.size(
          Paths.get(root, "metadata", s"v${t.currentVersion}.metadata.json"))
    }

    // 1. snapshot JSON plateaus: the v[N] snapshot is not materially bigger
    //    than the v[N/4] one (8× more commits, ~same metadata bytes)
    val bytesAtEnd = Files.size(
      Paths.get(root, "metadata", s"v${t.currentVersion}.metadata.json"))
    assert(bytesAtEnd <= bytesAtQuarter * 3 / 2,
      s"snapshot JSON must plateau: v(N/4)=$bytesAtQuarter B, v(N)=$bytesAtEnd B")

    // 2. manifest list bounded by the per-group merge backstop
    val snap = t.snapshot
    assert(snap.manifests.size <= 8 * snap.manifestGroups,
      s"${snap.manifests.size} manifests exceed the ${8 * snap.manifestGroups} backstop")

    // 3. per-bucket file count bounded under the compaction cadence:
    //    1 base + at most ~2×CompactEvery/8 deltas accumulated since
    (0 until 8).foreach { b =>
      val n = t.filesOf(snap, Set(b)).size
      assert(n <= 2 * CompactEvery / 8 * 2 + 2,
        s"bucket $b holds $n files — compaction cadence must bound this")
    }

    // 4. commit wall flat: the last decile's MEDIAN is within 4× of the
    //    first-after-warmup decile's (medians — a single GC pause or dirty
    //    page flush must not flake the build)
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val early = median(walls.slice(N / 10, 2 * N / 10).toSeq)
    val late = median(walls.takeRight(N / 10).toSeq)
    assert(late <= math.max(early, 1.0) * 4.0,
      s"commit wall must stay flat at depth: early=${early}ms late=${late}ms")

    // 5. history floor advanced (expiration really ran) and the table is
    //    still fully readable at the current version
    assert(t.minVersionAvailable > N / 2,
      s"expiration must advance the floor: ${t.minVersionAvailable}")
    assert(t.snapshot.fences("soak") == N.toLong)
  }
}
