package graft.cdc

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.LakeTable

/** L0 (shuffle-free append) mode equivalence + renamed-field fallback. */
class MergeModesSpec extends SparkSpec {
  import spark.implicits._

  private val N = 6000L

  private def state(t: LakeTable): Map[(String, String), String] =
    LakeMerge.readState(t).select($"repo", $"path", sha2($"content", 256))
      .as[(String, String, String)].collect()
      .map(x => (x._1, x._2) -> x._3).toMap

  private def oracle(): Map[(String, String), String] = {
    val events = EventGen.events(spark, N, nRepos = 50, pathsPerRepo = 8)
      .orderBy("lsn").as[ChangeEvent].collect().toSeq
    MergeEngine.foldOracle(events).map { case (k, e) =>
      k -> org.apache.commons.codec.digest.DigestUtils.sha256Hex(e.content)
    }
  }

  test("L0 appends resolve identically to classic bucketed merges; flush + compact re-bucket them") {
    val dir = tmpDir("l0")
    val classic = LakeTable.create(spark, s"$dir/classic", CdcStream.binlogSchema, 8)
    val l0 = LakeTable.create(spark, s"$dir/l0", CdcStream.binlogSchema, 8)
    val per = N / 3
    (0 until 3).foreach { b =>
      val batch = EventGen.eventsRange(spark, b * per, (b + 1) * per,
        nRepos = 50, pathsPerRepo = 8)
      LakeMerge.mergeBatch(classic, batch, Some(("c", b.toLong)))
      LakeMerge.mergeBatch(l0, batch, Some(("l", b.toLong)), l0Mode = true)
    }
    // L0 files really are unpartitioned appends: bucket sentinel, kind l0
    val l0Files = l0.files.filter(_.kind == "l0")
    assert(l0Files.nonEmpty && l0Files.forall(_.bucket == LakeTable.L0Bucket))
    // pre-flush: resolved states already agree (LWW resolves at read)
    assert(state(l0) == state(classic))
    assert(state(l0) == oracle())
    // L0 files carry footer lsn stats → lsn-range reads stay metadata-pruned
    assert(l0Files.forall(f => f.minLsn != Long.MinValue && f.maxLsn != Long.MaxValue))
    assert(l0.readLsnRange(0L, per - 1).count() == per)

    // point lookup through the L0 overlay
    val someRepo = LakeMerge.readState(classic).select($"repo").head().getString(0)
    val viaPoint = LakeMerge.readRepo(l0, someRepo)
      .select($"path", sha2($"content", 256)).as[(String, String)].collect().toMap
    val viaFull = LakeMerge.readState(classic).where($"repo" === someRepo)
      .select($"path", sha2($"content", 256)).as[(String, String)].collect().toMap
    assert(viaPoint == viaFull && viaPoint.nonEmpty)

    // flush: L0 files replaced by per-bucket deltas, state unchanged
    assert(LakeMerge.flushL0(l0, minFiles = 1))
    assert(!l0.files.exists(_.kind == "l0"))
    assert(l0.files.count(_.kind == "delta") > 0)
    assert(state(l0) == state(classic))

    // and a fresh L0 table full-compacts (flush folded into the same pass)
    val l0b = LakeTable.create(spark, s"$dir/l0b", CdcStream.binlogSchema, 8)
    LakeMerge.mergeBatch(l0b, EventGen.events(spark, N, nRepos = 50, pathsPerRepo = 8),
      Some(("x", 0L)), l0Mode = true)
    assert(LakeMerge.compact(l0b))
    assert(!l0b.files.exists(_.kind == "l0"))
    assert(l0b.files.forall(_.kind == "base"))
    assert(state(l0b) == oracle())
  }

  test("streaming replay in L0 mode converges to the fold oracle with mid-stream flushes") {
    val dir = tmpDir("l0stream")
    val binlog = s"$dir/binlog"
    EventGen.writeBinlog(spark, binlog, N, segments = 6, nRepos = 50, pathsPerRepo = 8)
    val table = LakeTable.create(spark, s"$dir/table", CdcStream.binlogSchema, 8)
    val metrics = CdcStream.metricsTable(spark, s"$dir/metrics")
    val q = CdcStream.start(spark, table, metrics, binlog, s"$dir/ckpt",
      queryId = "l0-replay", maxFilesPerTrigger = 1, compactAtDeltas = 2,
      l0Mode = true)
    q.awaitTermination()
    assert(state(table) == oracle())
    // the flush trigger fired: L0 count stays bounded by the trigger
    assert(table.files.count(_.kind == "l0") < 2)
    assert(metrics.read().agg(sum($"batch_rows")).collect()(0).getLong(0) == N)
  }

  test("L0 + mid-stream schema evolution: pre-evolution L0 files reconcile under the widened schema") {
    val dir = tmpDir("l0evolve")
    val table = LakeTable.create(spark, s"$dir/t", CdcStream.binlogSchema, 8)
    val langFrom = N / 2
    val per = N / 4
    (0 until 4).foreach { b =>
      // first two batches have lang null; later ones carry values — the L0
      // files of early batches stay pinned to their schemaId and must
      // reconcile (null-fill) under the evolved read schema
      val batch = EventGen.eventsRange(spark, b * per, (b + 1) * per,
        nRepos = 50, pathsPerRepo = 8, langFromLsn = langFrom)
        .withColumn("stars", when(lit(b) >= 2, col("lsn") % 5).otherwise(lit(null)).cast("int"))
      val toMerge = if (b < 2) batch.drop("stars") else batch
      LakeMerge.mergeBatch(table, toMerge, Some(("e", b.toLong)), l0Mode = true)
    }
    assert(table.schema.fieldNames.contains("stars"))
    assert(state(table) == {
      val events = EventGen.events(spark, N, nRepos = 50, pathsPerRepo = 8,
        langFromLsn = langFrom).orderBy("lsn").as[ChangeEvent].collect().toSeq
      MergeEngine.foldOracle(events).map { case (k, e) =>
        k -> org.apache.commons.codec.digest.DigestUtils.sha256Hex(e.content) }
    })
    // winners from late batches carry stars; early-batch winners read null
    val live = LakeMerge.readState(table)
    assert(live.where(col("lsn") >= 2 * per && col("stars").isNull).count() == 0)
    assert(live.where(col("lsn") < 2 * per).count() > 0)
    assert(live.where(col("lsn") < 2 * per && col("stars").isNotNull).count() == 0)
    // flush + full compact keep the evolved schema intact
    assert(LakeMerge.compact(table))
    assert(LakeMerge.readState(table).where(col("lsn") >= 2 * per)
      .where(col("stars").isNull).count() == 0)
  }

  test("mixed-mode ingest: L0 and classic batches interleaved on ONE table still resolve to the oracle") {
    val dir = tmpDir("l0mixed")
    val table = LakeTable.create(spark, s"$dir/t", CdcStream.binlogSchema, 8)
    val per = N / 4
    (0 until 4).foreach { b =>
      val batch = EventGen.eventsRange(spark, b * per, (b + 1) * per,
        nRepos = 50, pathsPerRepo = 8)
      // alternate shapes: the overlay algebra must not care how a batch landed
      LakeMerge.mergeBatch(table, batch, Some(("m", b.toLong)), l0Mode = b % 2 == 0)
    }
    assert(table.files.exists(_.kind == "l0") && table.files.exists(_.kind == "delta"))
    assert(state(table) == oracle())
    // incremental changes read spans both shapes (all four are appends)
    val changes = table.readChangesBetween(1, table.currentVersion)
    assert(changes.count() >= 2 * per) // at least the two raw L0 batches
    assert(MergeEngine.liveView(MergeEngine.dedupBatch(changes)).count() == oracle().size)
    // full compaction folds both shapes in one pass
    assert(LakeMerge.compact(table))
    assert(table.files.forall(_.kind == "base"))
    assert(state(table) == oracle())
  }

  test("L0 mode: kill/restart mid-stream from checkpoint reconverges byte-identically") {
    val dir = tmpDir("l0restart")
    val binlog = s"$dir/binlog"
    EventGen.writeBinlog(spark, binlog, N, segments = 6, nRepos = 50, pathsPerRepo = 8)
    val table = LakeTable.create(spark, s"$dir/table", CdcStream.binlogSchema, 8)
    val metrics = CdcStream.metricsTable(spark, s"$dir/metrics")

    val q1 = CdcStream.start(spark, table, metrics, binlog, s"$dir/ckpt",
      queryId = "l0-restart", maxFilesPerTrigger = 1, availableNow = false,
      compactAtDeltas = 2, l0Mode = true)
    var waited = 0
    while (table.fence("l0-restart") < 1L && waited < 300) { Thread.sleep(100); waited += 1 }
    q1.stop() // hard stop mid-stream
    assert(table.fence("l0-restart") >= 1L)

    val q2 = CdcStream.start(spark, table, metrics, binlog, s"$dir/ckpt",
      queryId = "l0-restart", maxFilesPerTrigger = 2,
      compactAtDeltas = 2, l0Mode = true)
    q2.awaitTermination()

    assert(state(table) == oracle())
    // lineage complete and exactly-once despite the kill
    val m = metrics.read().where(col("query_id") === "l0-restart")
      .orderBy("epoch_id").collect()
    assert(m.map(_.getAs[Long]("epoch_id")).toSeq == (0L to table.fence("l0-restart")))
    assert(m.map(_.getAs[Long]("batch_rows")).sum == N)
  }

  test("per-bucket major compaction must NOT purge watermarked tombstones while unflushed L0 files exist") {
    // Regression: a tombstone in a bucketed delta shadows an OLDER
    // already-delivered row sitting in an unflushed L0 file. A per-bucket
    // major (which never reads bucket-spanning L0 files) used to purge the
    // tombstone once it fell below the watermark — resurrecting the old row
    // at the next resolved read. The purge must wait until no L0 file is
    // outside the compaction's resolution set.
    val dir = tmpDir("l0purge")
    val table = LakeTable.create(spark, s"$dir/t", CdcStream.binlogSchema, 2)
    def ev(commit: String, lsn: Long, op: String, content: String) =
      ChangeEvent("r1", "p1", commit, lsn, op, "scala", content)

    // newer DELETE lands first, through the classic path (bucketed delta)
    LakeMerge.mergeBatch(table,
      Seq(ev("c002", 10L, "D", "")).toDF(), Some(("q", 0L)))
    // older UPSERT arrives late, through the zero-exchange L0 path
    LakeMerge.mergeBatch(table,
      Seq(ev("c001", 5L, "U", "old-body")).toDF(), Some(("q", 1L)), l0Mode = true)
    assert(state(table).isEmpty, "tombstone must shadow the older L0 row")

    // both events are now below the watermark; a major fires on the
    // tombstone's bucket while the L0 file is still unflushed
    LakeMerge.setWatermark(table, "c002", 10L)
    LakeMerge.compactTiered(table, sizeRatio = 0.0, maxDeltaFiles = 1)
    assert(table.files.exists(_.kind == "l0"), "L0 file must still be unflushed")
    assert(state(table).isEmpty,
      "purging the tombstone with an L0 row outstanding resurrects a deleted key")

    // once everything is in one resolution set, the purge happens and the
    // live view is STILL correct
    LakeMerge.compact(table) // full: folds base ∪ deltas ∪ L0 together
    assert(!table.files.exists(_.kind == "l0"))
    assert(LakeMerge.resolvedState(table).where(col("op") === "D").count() == 0,
      "full compaction purges the watermarked tombstone")
    assert(state(table).isEmpty)
  }

  test("renamed-field fallback: an aliased old column feeds the new column, no phantom created") {
    val dir = tmpDir("alias")
    val table = LakeTable.create(spark, s"$dir/t", CdcStream.binlogSchema, 4)
    // upstream renamed `lang` to `language` — alias map routes it back
    val batch = Seq(("r1", "p1", "c1", 1L, "U", "scala", "body"))
      .toDF("repo", "path", "commit", "lsn", "op", "language", "content")
    LakeMerge.mergeBatch(table, batch, Some(("a", 0L)),
      aliases = Map("language" -> "lang"))
    assert(table.schema.fieldNames.toSet == CdcStream.binlogSchema.fieldNames.toSet,
      "no phantom column from the renamed field")
    val row = LakeMerge.readState(table).collect()(0)
    assert(row.getAs[String]("lang") == "scala")

    // an alias whose new name is ALSO present leaves the batch untouched
    val batch2 = Seq(("r1", "p1", "c2", 2L, "U", "java", "go", "body2"))
      .toDF("repo", "path", "commit", "lsn", "op", "lang", "language", "content")
    LakeMerge.mergeBatch(table, batch2, Some(("a", 1L)),
      aliases = Map("language" -> "lang"))
    val row2 = LakeMerge.readState(table).orderBy(desc("lsn")).collect()(0)
    assert(row2.getAs[String]("lang") == "java")
  }

  test("skipIfEmpty: a zero-row batch stages once, commits nothing, leaves no files") {
    val dir = tmpDir("skipempty")
    val table = LakeTable.create(spark, s"$dir/t", CdcStream.binlogSchema, 4)
    LakeMerge.mergeBatch(table,
      EventGen.events(spark, 100L, nRepos = 5, pathsPerRepo = 2), Some(("s", 0L)))
    val v0 = table.currentVersion
    val files0 = table.files.map(_.path).toSet
    // empty batch through the DML path: no version, no staged leftovers
    val empty = EventGen.events(spark, 100L, nRepos = 5, pathsPerRepo = 2)
      .where(lit(false))
    val stats = LakeMerge.mergeBatch(table, empty, skipIfEmpty = true)
    assert(!stats.applied && stats.distinctKeys == 0L)
    assert(table.currentVersion == v0, "no empty table version committed")
    assert(table.files.map(_.path).toSet == files0)
    // the staged (empty) write left no dangling data dirs beyond v0's
    val dataDirs = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$dir/t", "data")).count()
    assert(dataDirs <= files0.map(p =>
      java.nio.file.Paths.get(p).getParent).size + 1,
      "empty staged dir reclaimed or never created")
    // a NON-empty batch through the same flag still commits normally
    val stats2 = LakeMerge.mergeBatch(table,
      EventGen.eventsRange(spark, 100L, 200L, nRepos = 5, pathsPerRepo = 2),
      Some(("s", 1L)), skipIfEmpty = true)
    assert(stats2.applied && table.currentVersion > v0)
  }
}
