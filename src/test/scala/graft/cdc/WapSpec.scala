package graft.cdc

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.LakeTable

/** Write-audit-publish over the LWW merge: staged batches are invisible,
  * auditable, pinned against GC/retention, and publish atomically into
  * exactly the state a direct merge would have produced. */
class WapSpec extends SparkSpec {
  import spark.implicits._

  private val schema = CdcStream.binlogSchema

  private def ev(rows: (String, String, String, Long, String, String)*) =
    rows.toSeq
      .map { case (r, p, c, l, o, v) => (r, p, c, l, o, null: String, v) }
      .toDF(schema.fieldNames.toSeq: _*)

  private def state(t: LakeTable): Set[(String, String)] =
    LakeMerge.readState(t).select("repo", "content")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  private val batch1 = ev(
    ("r1", "p", "c1", 1L, "U", "v1"),
    ("r2", "p", "c1", 2L, "U", "v2"))
  // update r1, tombstone r2, insert r3, plus an intra-batch dup on r3
  private val batch2 = ev(
    ("r1", "p", "c2", 5L, "U", "v1b"),
    ("r2", "p", "c2", 6L, "D", null),
    ("r3", "p", "c1", 1L, "U", "staleDup"),
    ("r3", "p", "c1", 3L, "U", "v3"))
  private val expectedFinal = Set(("r1", "v1b"), ("r3", "v3"))

  test("stage is invisible and GC/retention-proof; audit view previews; publish lands atomically") {
    val root = tmpDir("wap")
    val t = LakeTable.create(spark, root, schema, numBuckets = 4)
    LakeMerge.mergeBatch(t, batch1, Some(("w", 0L)))
    val vPre = t.currentVersion
    val staged = LakeMerge.wapStage(t, batch2, "audit-1")
    assert(staged.nonEmpty && staged.forall(_.rows >= 0))
    // invisible: no commit happened, readers see batch1 alone
    assert(t.currentVersion == vPre)
    assert(state(t) == Set(("r1", "v1"), ("r2", "v2")))
    // the audit view IS the post-publish state
    val audited = LakeMerge.wapView(t, "audit-1")
      .select("repo", "content").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(audited == expectedFinal)
    // staged files survive GC and an aggressive retention sweep
    assert(t.gcOrphans() == 0, "wap-staged dirs must be pinned from gcOrphans")
    t.expireSnapshots(retainLast = 1)
    assert(staged.forall(f => Files.exists(Paths.get(f.path))),
      "wap-staged files must be pinned from expireSnapshots")
    // publish: ONE atomic fenced append, stamped with the wap id
    val snap = LakeMerge.wapPublish(t, "audit-1", fence = Some(("w", 1L)))
    assert(snap.summary("operation") == "wap-publish" &&
      snap.summary("wap-id") == "audit-1")
    assert(state(t) == expectedFinal)
    assert(t.fence("w") == 1L)
    assert(t.wapIds.isEmpty, "published sidecar must be gone")
    // equivalence: a direct merge of both batches lands the same state
    val twin = LakeTable.create(spark, tmpDir("wap-twin"), schema, numBuckets = 4)
    LakeMerge.mergeBatch(twin, batch1)
    LakeMerge.mergeBatch(twin, batch2)
    assert(state(twin) == state(t))
  }

  test("abort deletes staged files and sidecar; nothing was ever visible") {
    val root = tmpDir("wap-abort")
    val t = LakeTable.create(spark, root, schema, numBuckets = 2)
    LakeMerge.mergeBatch(t, batch1)
    val staged = LakeMerge.wapStage(t, batch2, "bad-batch")
    LakeMerge.wapAbort(t, "bad-batch")
    assert(state(t) == Set(("r1", "v1"), ("r2", "v2")))
    assert(staged.forall(f => !Files.exists(Paths.get(f.path))))
    assert(t.wapIds.isEmpty)
    intercept[IllegalArgumentException](LakeMerge.wapView(t, "bad-batch"))
    // id is reusable after abort
    LakeMerge.wapStage(t, batch2, "bad-batch")
    LakeMerge.wapPublish(t, "bad-batch")
    assert(state(t) == expectedFinal)
  }

  test("duplicate and malformed wap ids are rejected loudly") {
    val root = tmpDir("wap-ids")
    val t = LakeTable.create(spark, root, schema, numBuckets = 2)
    LakeMerge.wapStage(t, batch1, "once")
    val e = intercept[IllegalArgumentException](LakeMerge.wapStage(t, batch1, "once"))
    assert(e.getMessage.contains("already staged"))
    intercept[IllegalArgumentException](LakeMerge.wapStage(t, batch1, "../evil"))
    assert(t.wapIds == Seq("once"))
  }

  test("publish after a concurrent rebucket: era-stamped staged files stay correct") {
    val root = tmpDir("wap-rebucket")
    val t = LakeTable.create(spark, root, schema, numBuckets = 2)
    LakeMerge.mergeBatch(t, batch1)
    // stage under the 2-bucket layout...
    LakeMerge.wapStage(t, batch2, "pre-evo")
    // ...then the table's layout evolves underneath the audit window
    t.rebucket(8)
    assert(LakeTable.load(spark, root).snapshot.numBuckets == 8)
    LakeMerge.wapPublish(t, "pre-evo")
    // staged files carry their own era stamp (layoutBuckets=2), so
    // era-aware reads resolve them correctly under the new layout
    assert(state(t) == expectedFinal)
    // point lookups across the era mix stay exact
    assert(LakeMerge.readRepo(t, "r3").collect()
      .head.getAs[String]("content") == "v3")
    assert(LakeMerge.readRepo(t, "r2").collect().isEmpty,
      "published tombstone must hold across the layout evolution")
    // compaction migrates everything into the new layout, state unchanged
    LakeMerge.compact(t)
    assert(state(t) == expectedFinal)
  }

  test("gcOrphans spares live L0 and imported dirs (shallow staging-dir regression)") {
    val root = tmpDir("wap-gcl0")
    val t = LakeTable.create(spark, root, schema, numBuckets = 2)
    // live L0 commit: data/<uuid>/part.parquet — one level shallower than
    // bucketed files; the old fixed-depth grandparent mapping classified
    // these dirs as orphans and deleted LIVE data
    LakeMerge.mergeBatch(t, batch1, Some(("g", 0L)), l0Mode = true)
    // live imported file: same shallow shape via a hard link
    val ext = tmpDir("wap-gc-ext")
    ev(("r9", "p", "c1", 1L, "U", "v9")).coalesce(1).write.parquet(s"$ext/src")
    val part = graft.util.Fs.walk(Paths.get(s"$ext/src"))
      .filter(_.getFileName.toString.endsWith(".parquet")).head.toString
    t.addFiles(Seq(part))
    assert(t.gcOrphans() == 0, "live L0/import dirs must never be orphans")
    assert(state(t) == Set(("r1", "v1"), ("r2", "v2"), ("r9", "v9")))
  }
}
