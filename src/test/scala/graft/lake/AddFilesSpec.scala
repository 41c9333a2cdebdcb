package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.{CdcStream, LakeMerge}

/** Zero-copy in-place import ([[LakeTable.addFiles]]): the 100 TB
  * migration path. Registration must be metadata-only (hard links, footer
  * stats, zero Spark jobs), the imported rows must merge-on-read exactly
  * like streamed L0 ingest (LWW across native and imported rows, imported
  * tombstones delete), and the normal lifecycle (flush, compaction,
  * lookups) must treat the files as first-class. */
class AddFilesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = CdcStream.binlogSchema

  private def ev(rows: (String, String, String, Long, String, String)*) =
    rows.toSeq
      .map { case (r, p, c, l, o, v) => (r, p, c, l, o, null: String, v) }
      .toDF(schema.fieldNames.toSeq: _*)

  /** Write `df` as exactly one parquet file in a fresh dir; return its path. */
  private def onePart(df: org.apache.spark.sql.DataFrame, dir: String): String = {
    df.coalesce(1).write.parquet(dir)
    graft.util.Fs.walk(Paths.get(dir))
      .filter(_.getFileName.toString.endsWith(".parquet")).head.toString
  }

  private def state(t: LakeTable): Set[(String, String, String)] =
    LakeMerge.readState(t).select("repo", "path", "content")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("addFiles: zero-copy, zero-job registration; imported rows merge-on-read with native ones") {
    val root = tmpDir("addf")
    val t = LakeTable.create(spark, root, schema, numBuckets = 4)
    // native ingest: r1 (will be updated by import), r2 (will be tombstoned)
    LakeMerge.mergeBatch(t, ev(
      ("r1", "p", "c1", 1L, "U", "native1"),
      ("r2", "p", "c1", 2L, "U", "native2"),
      ("r3", "p", "c1", 3L, "U", "native3")))
    // external parquet: an update for r1, a WINNING tombstone for r2, a
    // LOSING (stale) update for r3, an intra-file duplicate pair for r4
    val ext = onePart(ev(
      ("r1", "p", "c2", 9L, "U", "imported1"),
      ("r2", "p", "c2", 9L, "D", null),
      ("r3", "p", "c0", 0L, "U", "stale"),
      ("r4", "p", "c1", 1L, "U", "dupA"),
      ("r4", "p", "c1", 2L, "U", "dupB")), tmpDir("addf-ext") + "/src")
    val vBefore = t.currentVersion
    val sc = spark.sparkContext
    val jobsBefore = sc.statusTracker.getJobIdsForGroup(null).length
    val snap = t.addFiles(Seq(ext))
    assert(sc.statusTracker.getJobIdsForGroup(null).length == jobsBefore,
      "addFiles launched a Spark job — it must be metadata/footer-only")
    assert(snap.opKind == "append" && snap.summary("operation") == "add-files")
    // hard link, not a copy: same inode, source untouched
    val meta = t.files.find(_.kind == "l0").get
    assert(Files.exists(Paths.get(ext)), "source file must survive import")
    assert(Files.getAttribute(Paths.get(ext), "unix:ino") ==
      Files.getAttribute(Paths.get(meta.path), "unix:ino"),
      "registered file must be a hard link of the source (zero-copy)")
    assert(meta.bucket == LakeTable.L0Bucket && meta.layoutBuckets == 0)
    // footer stats lifted: exact rows, lsn range, key bloom present
    assert(meta.rows == 5L)
    assert(meta.minLsn == 0L && meta.maxLsn == 9L)
    assert(meta.keyBloom != null, "dictionary-page key bloom must be lifted")
    // LWW across native + imported: update wins, tombstone deletes, stale
    // import loses, intra-file dup resolves
    assert(state(t) == Set(
      ("r1", "p", "imported1"), ("r3", "p", "native3"), ("r4", "p", "dupB")))
    // the whole import is ONE commit over the pre-import version (plus at
    // most one schema-registration metadata commit)
    assert(t.currentVersion <= vBefore + 2)
    // point lookup resolves through the imported file too
    assert(LakeMerge.readRepo(t, "r4").collect().head.getAs[String]("content") == "dupB")
    // lifecycle: flush L0 into buckets, state unchanged, no L0 left
    assert(LakeMerge.flushL0(t, minFiles = 1))
    assert(t.files.forall(_.kind != "l0"))
    assert(state(t) == Set(
      ("r1", "p", "imported1"), ("r3", "p", "native3"), ("r4", "p", "dupB")))
  }

  test("addFiles: schema drift — narrower and wider files both reconcile") {
    val root = tmpDir("addf-schema")
    val t = LakeTable.create(spark, root, schema, numBuckets = 2)
    LakeMerge.mergeBatch(t, ev(("r1", "p", "c1", 1L, "U", "v1")))
    // NARROWER: no content column at all → reads back null
    val narrow = onePart(
      Seq(("r5", "p", "c1", 1L, "U")).toDF("repo", "path", "commit", "lsn", "op"),
      tmpDir("addf-n") + "/src")
    t.addFiles(Seq(narrow))
    // WIDER: an extra column the table has never seen → table widens,
    // old rows read null for it
    val wide = onePart(
      Seq(("r6", "p", "c1", 1L, "U", null: String, "v6", "extra!"))
        .toDF(schema.fieldNames.toSeq :+ "sidecar": _*),
      tmpDir("addf-w") + "/src")
    t.addFiles(Seq(wide))
    assert(t.schema.fieldNames.contains("sidecar"))
    val rows = LakeMerge.readState(t)
      .select("repo", "content", "sidecar")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set(("r1", "v1", null), ("r5", null, null), ("r6", "v6", "extra!")))
  }

  test("addFiles: missing CDC envelope is rejected loudly; mixed schemas in one call too") {
    val root = tmpDir("addf-bad")
    val t = LakeTable.create(spark, root, schema, numBuckets = 2)
    val noOp = onePart(
      Seq(("r1", "p", "c1", 1L)).toDF("repo", "path", "commit", "lsn"),
      tmpDir("addf-noop") + "/src")
    val e = intercept[IllegalArgumentException](t.addFiles(Seq(noOp)))
    assert(e.getMessage.contains("op"))
    val a = onePart(ev(("r1", "p", "c1", 1L, "U", "a")), tmpDir("addf-a") + "/src")
    val b = onePart(
      Seq(("r2", "p", "c1", 2L, "U")).toDF("repo", "path", "commit", "lsn", "op"),
      tmpDir("addf-b") + "/src")
    val e2 = intercept[Exception](t.addFiles(Seq(a, b)))
    assert(e2.getMessage.contains("schema"), s"got: ${e2.getMessage}")
    // the failed import must not have left visible rows
    assert(LakeMerge.readState(t).count() == 0L)
  }
}
