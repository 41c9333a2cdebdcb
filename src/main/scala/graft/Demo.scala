package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc._
import graft.lake.LakeTable

/** End-to-end demo of the public API: generate a binlog → tail it with the
  * streaming replay (kill + restart mid-stream) → evolve schema → verify
  * against the independent fold oracle → compact → GC. Run:
  * `sbt "runMain graft.Demo [workdir]"`. Exits non-zero on any mismatch. */
object Demo {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0)
      else Files.createTempDirectory("graft-demo").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    def log(s: String): Unit = println(s"[demo] $s")

    val n = 30000L
    log(s"workdir: $dir")

    // 1. binlog: 30k events, lang column appears mid-stream (evolution)
    EventGen.writeBinlog(spark, s"$dir/binlog", n, segments = 10,
      nRepos = 150, pathsPerRepo = 12, langFromLsn = n / 2)
    log(s"binlog written: ${new java.io.File(s"$dir/binlog").list().length} segment files")

    // 2. table + metrics sidecar, streaming tail (continuous), kill mid-way
    val table = LakeTable.create(spark, s"$dir/table", CdcStream.binlogSchema, numBuckets = 16)
    val metrics = CdcStream.metricsTable(spark, s"$dir/metrics")
    val q1 = CdcStream.start(spark, table, metrics, s"$dir/binlog", s"$dir/ckpt",
      queryId = "demo", maxFilesPerTrigger = 2, availableNow = false)
    while (table.fence("demo") < 1L) Thread.sleep(100)
    q1.stop()
    log(s"killed stream after epoch ${table.fence("demo")} (snapshot v${table.currentVersion})")

    // 3. restart from checkpoint, drain to the end
    val q2 = CdcStream.start(spark, table, metrics, s"$dir/binlog", s"$dir/ckpt",
      queryId = "demo", maxFilesPerTrigger = 4)
    q2.awaitTermination()
    log(s"drained: fence=${table.fence("demo")}, snapshot v${table.currentVersion}, " +
      s"files=${table.files.size} (${table.files.count(_.kind == "delta")} deltas)")

    // 4. verify against the independent fold oracle (sha256 per key)
    val oracle = MergeEngine.foldOracle(
      EventGen.events(spark, n, nRepos = 150, pathsPerRepo = 12, langFromLsn = n / 2)
        .orderBy("lsn").as[ChangeEvent].collect().toSeq)
      .map { case (k, e) => k -> org.apache.commons.codec.digest.DigestUtils.sha256Hex(e.content) }
    val got = LakeMerge.readState(table)
      .select($"repo", $"path", sha2($"content", 256))
      .as[(String, String, String)].collect()
      .map(x => (x._1, x._2) -> x._3).toMap
    log(s"state: ${got.size} live keys; oracle: ${oracle.size}")
    assert(got == oracle, "state != fold oracle")
    log("sha256 per-row equality vs fold oracle: MATCH")

    // 5. fenced redelivery probe: re-apply an already-committed epoch
    val batch = EventGen.events(spark, 1000L, nRepos = 150, pathsPerRepo = 12)
    val redelivered = CdcStream.applyBatch(table, metrics, batch, "demo", 0L)
    assert(!redelivered.applied, "fence failed to reject redelivered epoch")
    log(s"redelivered epoch 0 → fenced no-op (applied=${redelivered.applied})")

    // 6. schema evolution probe: widen + add a column via a new batch
    val widened = batch
      .withColumn("stars", (col("lsn") % 5).cast("int"))
    val st = LakeMerge.mergeBatch(table, widened, Some(("demo-evolve", 0L)))
    assert(table.schema.fieldNames.contains("stars"), "additive column missing")
    // the evolve batch replays LOW (commit, lsn) events, so every one loses
    // LWW against stored winners: stars stays null everywhere — evolution
    // changed the schema, late losers changed nothing. Exactly the contract.
    log(s"schema evolved to v${table.snapshot.schemaId}: +stars column " +
      s"(rows with null stars — late losers can't overwrite: " +
      s"${LakeMerge.readState(table).where(col("stars").isNull).count()})")

    // 7. compact + GC
    LakeMerge.compact(table)
    val orphans = table.gcOrphans()
    log(s"compacted → ${table.files.size} base files; GC removed $orphans orphan dirs")
    val after = LakeMerge.readState(table)
      .select($"repo", $"path", sha2($"content", 256))
      .as[(String, String, String)].collect()
      .map(x => (x._1, x._2) -> x._3).toMap
    // every pre-evolve oracle key must read back byte-identically after
    // compaction + GC (the evolve batch only ADDED keys/columns)
    assert(oracle.forall { case (k, v) => after.get(k).contains(v) },
      "post-compaction state diverged from oracle on pre-evolve keys")
    log(s"post-compaction state: ${after.size} keys (includes evolve-batch upserts)")

    // 7b. retention: expire all but the last 2 snapshots, physically
    // reclaiming every file only the expired history referenced — the live
    // view must be untouched and expired versions must fail cleanly
    def diskBytes(): Long = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/table", "data"))
        .iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size(_)).sum
    }
    val diskBefore = diskBytes()
    val exp = table.expireSnapshots(retainLast = 2)
    val diskAfter = diskBytes()
    assert(diskAfter < diskBefore, "expiration must reclaim disk")
    val afterExpire = LakeMerge.readState(table)
      .select($"repo", $"path", sha2($"content", 256))
      .as[(String, String, String)].collect()
      .map(x => (x._1, x._2) -> x._3).toMap
    assert(afterExpire == after, "expiration must not change the live view")
    val expiredFails =
      try { table.readVersion(2); false }
      catch { case _: IllegalStateException => true }
    assert(expiredFails, "expired version must fail cleanly")
    log(f"expired ${exp.expiredVersions} snapshots: reclaimed ${exp.dataFilesDeleted} files / " +
      f"${exp.bytesReclaimed / 1024} KiB (disk ${diskBefore / 1024} → ${diskAfter / 1024} KiB); live view unchanged")

    // 8. lineage sidecar
    val m = metrics.read().orderBy("epoch_id")
      .select("epoch_id", "batch_rows", "distinct_keys", "deletes", "min_lsn", "max_lsn")
      .collect()
    log(s"lineage rows: ${m.length}; total rows accounted: ${m.map(_.getLong(1)).sum}")
    m.take(3).foreach(r => log(s"  epoch ${r.getLong(0)}: rows=${r.getLong(1)} keys=${r.getLong(2)} dels=${r.getLong(3)} lsn=[${r.getLong(4)},${r.getLong(5)}]"))

    // 9. L0 (shuffle-free) ingest mode with BACKGROUND compaction: replay
    // the same binlog through zero-exchange appends, flushes/compactions on
    // the compactor thread; the resolved state must equal the classic
    // table's pre-evolve oracle byte-for-byte after the drain
    val tableL0 = LakeTable.create(spark, s"$dir/table-l0", CdcStream.binlogSchema, numBuckets = 16)
    val metricsL0 = CdcStream.metricsTable(spark, s"$dir/metrics-l0")
    val qL0 = CdcStream.start(spark, tableL0, metricsL0, s"$dir/binlog", s"$dir/ckpt-l0",
      queryId = "demo-l0", maxFilesPerTrigger = 3, compactAtDeltas = 4, l0Mode = true,
      asyncCompact = true)
    qL0.awaitTermination()
    val passes = CdcStream.compactorOf("demo-l0").map { c => c.drain(); c.passes }.getOrElse(0L)
    CdcStream.drainCompaction("demo-l0")
    val gotL0 = LakeMerge.readState(tableL0)
      .select($"repo", $"path", sha2($"content", 256))
      .as[(String, String, String)].collect()
      .map(x => (x._1, x._2) -> x._3).toMap
    assert(gotL0 == oracle, "L0-mode state != fold oracle")
    assert(passes > 0L, "background compactor never ran")
    log(s"L0-mode replay (async compaction, $passes background passes): " +
      s"${gotL0.size} keys, sha256 equality vs fold oracle: MATCH " +
      s"(${tableL0.files.count(_.kind == "l0")} unflushed L0 files remain)")

    // 10. zero-copy in-place import (the migration path): a foreign parquet
    // corpus becomes table data with NO data pages read, then merges with
    // natively-ingested rows under the same LWW contract
    val impEvents = EventGen.events(spark, 5000L, nRepos = 150, pathsPerRepo = 12,
      langFromLsn = 0L)
    impEvents.where($"lsn" >= 2000 && $"lsn" < 4000).write.parquet(s"$dir/foreign")
    val tImp = LakeTable.create(spark, s"$dir/table-import", CdcStream.binlogSchema, numBuckets = 8)
    LakeMerge.mergeBatch(tImp, impEvents.where($"lsn" < 2000), Some(("imp", 0L)))
    val foreign = graft.util.Fs.walk(java.nio.file.Paths.get(s"$dir/foreign"))
      .filter { p =>
        val nm = p.getFileName.toString
        nm.endsWith(".parquet") && !nm.startsWith(".") && !nm.startsWith("_")
      }
    tImp.addFiles(foreign.map(_.toString))
    def shaState(t: LakeTable): Map[(String, String), String] = LakeMerge.readState(t)
      .select($"repo", $"path", sha2($"content", 256))
      .as[(String, String, String)].collect().map(x => (x._1, x._2) -> x._3).toMap
    def foldSha(upTo: Long): Map[(String, String), String] = MergeEngine.foldOracle(
      impEvents.where($"lsn" < upTo).orderBy("lsn").as[ChangeEvent].collect().toSeq)
      .map { case (k, e) => k -> org.apache.commons.codec.digest.DigestUtils.sha256Hex(e.content) }
    assert(shaState(tImp) == foldSha(4000L), "imported state != fold oracle")
    log(s"zero-copy import: ${foreign.size} foreign parquet files registered " +
      "(hard-linked, footer stats, no data pages read); merged state == fold oracle: MATCH")

    // 11. write-audit-publish: the tail slice staged invisibly, audited,
    // then published in one atomic fenced commit
    val preWap = shaState(tImp)
    LakeMerge.wapStage(tImp, impEvents.where($"lsn" >= 4000), "demo-wap")
    assert(shaState(tImp) == preWap, "staged WAP leaked into readers")
    val auditKeys = LakeMerge.wapView(tImp, "demo-wap").count()
    LakeMerge.wapPublish(tImp, "demo-wap", fence = Some(("imp", 1L)))
    assert(shaState(tImp) == foldSha(5000L), "post-publish state != fold oracle")
    log(s"write-audit-publish: staged invisibly (audit view: $auditKeys keys) → " +
      "one atomic publish; state == fold oracle: MATCH")

    // 12. SQL materialized view over the imported table: define, ingest
    // more, refresh incrementally, read back typed
    val sqlS = graft.sql.GraftSql.attach(spark, root = Some(dir))
    sqlS.sql("CALL graft.create_mart('table-import', 'mart-demo', 'bylang', " +
      "'SELECT lang, count(*) AS n FROM source GROUP BY lang', 'lang')").collect()
    val more = EventGen.events(spark, 6000L, nRepos = 150, pathsPerRepo = 12,
      langFromLsn = 0L).where($"lsn" >= 5000)
    LakeMerge.mergeBatch(tImp, more, Some(("imp", 2L)))
    sqlS.sql("CALL graft.refresh_mart('mart-demo', 'bylang')").collect()
    val viewRows = sqlS.sql("SELECT lang, n FROM graft.`mart-demo`.view_bylang")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val direct = LakeMerge.readState(tImp).groupBy("lang").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(viewRows == direct, "materialized view != direct aggregate")
    log(s"SQL materialized view: create → incremental refresh → typed read; " +
      s"view == direct aggregate (${viewRows.size} groups)")

    log("DEMO OK")
    spark.stop()
  }
}
