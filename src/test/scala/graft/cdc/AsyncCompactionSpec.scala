package graft.cdc

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.LakeTable

/** Round-4 hardening (VERDICT r3 #2/#3/#4): background compaction off the
  * ingest path, two concurrent writer streams on one table, and a
  * continuous-trigger run with live segment arrivals + mid-stream kill. */
class AsyncCompactionSpec extends SparkSpec {
  import spark.implicits._

  private val N = 8000L

  private def oracleState(n: Long = N): Map[(String, String), String] = {
    val events = EventGen.events(spark, n, nRepos = 80, pathsPerRepo = 10)
      .orderBy("lsn").as[ChangeEvent].collect().toSeq
    MergeEngine.foldOracle(events).map { case (k, e) =>
      k -> org.apache.commons.codec.digest.DigestUtils.sha256Hex(e.content)
    }
  }

  private def tableState(t: LakeTable): Map[(String, String), String] =
    LakeMerge.readState(t).select($"repo", $"path", sha2($"content", 256))
      .as[(String, String, String)].collect()
      .map(x => (x._1, x._2) -> x._3).toMap

  private def drained(binlog: String, root: String, queryId: String,
      l0Mode: Boolean, async: Boolean): LakeTable = {
    val t = LakeTable.create(spark, s"$root/table", CdcStream.binlogSchema, numBuckets = 8)
    val m = CdcStream.metricsTable(spark, s"$root/metrics")
    val q = CdcStream.start(spark, t, m, binlog, s"$root/ckpt", queryId = queryId,
      maxFilesPerTrigger = 1, compactAtDeltas = 2, l0Mode = l0Mode,
      asyncCompact = async)
    q.awaitTermination()
    if (async) {
      val c = CdcStream.compactorOf(queryId).get
      c.drain()
      assert(c.passes > 0, "background compactor never ran a pass")
      CdcStream.drainCompaction(queryId)
    }
    t
  }

  test("async compaction converges to the same state as the serial path (classic + L0)") {
    val binlog = s"${tmpDir("async-binlog")}/binlog"
    EventGen.writeBinlog(spark, binlog, N, segments = 8, nRepos = 80, pathsPerRepo = 10)
    val oracle = oracleState()
    for (l0 <- Seq(false, true)) {
      val serial = drained(binlog, tmpDir(s"async-serial-$l0"), s"ser-$l0", l0, async = false)
      val async = drained(binlog, tmpDir(s"async-async-$l0"), s"asy-$l0", l0, async = true)
      assert(tableState(serial) == oracle, s"serial path diverged (l0=$l0)")
      assert(tableState(async) == oracle, s"async path diverged (l0=$l0)")
      // the background passes actually bounded read amplification: after a
      // final drain the table is not an unbounded pile of per-batch deltas
      val deltas = async.files.count(_.kind != "base")
      assert(deltas < 16, s"async compaction left $deltas non-base files (l0=$l0)")
    }
  }

  test("async compaction failure latches and surfaces on the ingest path") {
    val root = tmpDir("async-fail")
    val t = LakeTable.create(spark, s"$root/table", CdcStream.binlogSchema, numBuckets = 2)
    val c = new Compactor(t, maxDeltaFiles = 1)
    // sabotage: delete the table's metadata dir so the pass blows up
    graft.util.Fs.rmTree(Paths.get(s"$root/table"))
    c.poke()
    // wait for the sabotaged pass to finish WITHOUT the failure-rethrow
    // (drain would throw here — but then a pass that silently succeeded
    // would be indistinguishable; assert the latched failure explicitly)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!c.hasFailed && System.nanoTime() < deadline) Thread.sleep(20)
    assert(c.hasFailed, "sabotaged compaction pass did not record a failure")
    intercept[IllegalStateException] { c.drain() }
    intercept[IllegalStateException] { c.poke() }
  }

  test("L0 flush bytes trigger: fires on accumulated volume below the file-count bound") {
    val root = tmpDir("l0bytes")
    val t = LakeTable.create(spark, s"$root/table", CdcStream.binlogSchema, numBuckets = 4)
    // two L0 appends — far below a count trigger of 100
    (0 until 2).foreach { b =>
      LakeMerge.mergeBatch(t,
        EventGen.eventsRange(spark, b * 500L, (b + 1) * 500L, nRepos = 20, pathsPerRepo = 5),
        Some(("l0b", b.toLong)), l0Mode = true)
    }
    val l0Bytes = t.files.filter(_.kind == "l0").map(_.bytes).sum
    assert(l0Bytes > 0)
    // below both thresholds: no flush
    assert(!LakeMerge.flushL0(t, minFiles = 100, minBytes = l0Bytes * 10))
    assert(t.files.exists(_.kind == "l0"))
    // bytes threshold reached (count still far away): flush fires
    assert(LakeMerge.flushL0(t, minFiles = 100, minBytes = l0Bytes))
    assert(!t.files.exists(_.kind == "l0"), "flush must re-bucket every L0 file")
    // resolved state unaffected by when the flush happened
    val oracle = MergeEngine.foldOracle(
      EventGen.events(spark, 1000L, nRepos = 20, pathsPerRepo = 5)
        .orderBy("lsn").as[ChangeEvent].collect().toSeq)
    assert(tableState(t) == oracle.map { case (k, e) =>
      k -> org.apache.commons.codec.digest.DigestUtils.sha256Hex(e.content) })
  }

  test("two concurrent writer streams + background compaction: deterministic state, both fences, no lost rows") {
    val dir = tmpDir("twowriters")
    // one deterministic stream, split into two disjoint binlogs (first /
    // second half of the lsn range) — one per writer
    val all = s"$dir/all"
    EventGen.writeBinlog(spark, all, N, segments = 8, nRepos = 80, pathsPerRepo = 10)
    val binlogA = s"$dir/binlogA"; val binlogB = s"$dir/binlogB"
    Files.createDirectories(Paths.get(binlogA)); Files.createDirectories(Paths.get(binlogB))
    Files.list(Paths.get(all)).iterator().asScala.toList.sortBy(_.toString)
      .zipWithIndex.foreach { case (p, i) =>
        val dest = if (i < 4) binlogA else binlogB
        Files.move(p, Paths.get(dest, p.getFileName.toString))
      }

    // two INDEPENDENT LakeTable handles over the same root — the writers
    // coordinate only through the on-disk optimistic commit protocol
    LakeTable.create(spark, s"$dir/table", CdcStream.binlogSchema, numBuckets = 8)
    val tA = LakeTable.load(spark, s"$dir/table")
    val tB = LakeTable.load(spark, s"$dir/table")
    val mA = CdcStream.metricsTable(spark, s"$dir/metrics")
    val mB = LakeTable.load(spark, s"$dir/metrics")

    val qA = CdcStream.start(spark, tA, mA, binlogA, s"$dir/ckptA", queryId = "writerA",
      maxFilesPerTrigger = 1, compactAtDeltas = 2, asyncCompact = true)
    val qB = CdcStream.start(spark, tB, mB, binlogB, s"$dir/ckptB", queryId = "writerB",
      maxFilesPerTrigger = 1, compactAtDeltas = 2, asyncCompact = true)
    qA.awaitTermination(); qB.awaitTermination()
    CdcStream.drainCompaction("writerA"); CdcStream.drainCompaction("writerB")

    val t = LakeTable.load(spark, s"$dir/table")
    assert(tableState(t) == oracleState(), "concurrent writers lost or corrupted rows")
    assert(t.fence("writerA") == 3L, s"writerA fence = ${t.fence("writerA")}")
    assert(t.fence("writerB") == 3L, s"writerB fence = ${t.fence("writerB")}")
    // lineage accounted for every event exactly once across both writers
    val m = LakeTable.load(spark, s"$dir/metrics").read().collect()
    assert(m.map(_.getAs[Long]("batch_rows")).sum == N)
    // no file referenced twice, none lost: resolved read already proved
    // content; check the snapshot's file set is internally consistent
    val paths = t.files.map(_.path)
    assert(paths.distinct.size == paths.size, "duplicate file references in snapshot")
  }

  test("continuous trigger: live segment arrivals, mid-stream kill, restart reconverges") {
    val dir = tmpDir("continuous")
    val binlog = s"$dir/binlog"
    val total = 8000L
    // phase 1: half the stream exists at start
    EventGen.writeBinlog(spark, binlog, total / 2, segments = 4, nRepos = 80, pathsPerRepo = 10)
    val table = LakeTable.create(spark, s"$dir/table", CdcStream.binlogSchema, numBuckets = 8)
    val metrics = CdcStream.metricsTable(spark, s"$dir/metrics")

    val q1 = CdcStream.start(spark, table, metrics, binlog, s"$dir/ckpt",
      queryId = "cont", maxFilesPerTrigger = 1, availableNow = false,
      compactAtDeltas = 2, asyncCompact = true)
    var waited = 0
    while (table.fence("cont") < 1L && waited < 600) { Thread.sleep(100); waited += 1 }
    assert(table.fence("cont") >= 1L, "stream made no progress under continuous trigger")

    // live arrivals: the second half lands WHILE the query is running
    val more = tmpDir("continuous-more")
    EventGen.writeBinlog(spark, more, total, segments = 8, nRepos = 80, pathsPerRepo = 10)
    Files.list(Paths.get(more)).iterator().asScala.toList.sortBy(_.toString)
      .drop(4).foreach { p =>
        // atomic visibility for the tailing source: copy under a dot-name,
        // then rename into place (same pattern a real binlog shipper uses)
        val tmp = Paths.get(binlog, "." + p.getFileName.toString)
        Files.copy(p, tmp)
        Files.move(tmp, Paths.get(binlog, p.getFileName.toString))
      }
    // let it ingest some of the new segments, then kill mid-stream
    waited = 0
    while (table.fence("cont") < 5L && waited < 600) { Thread.sleep(100); waited += 1 }
    q1.stop()
    CdcStream.drainCompaction("cont")

    // restart from checkpoint, drain the remainder deterministically
    val q2 = CdcStream.start(spark, table, metrics, binlog, s"$dir/ckpt",
      queryId = "cont", maxFilesPerTrigger = 2, compactAtDeltas = 2, asyncCompact = true)
    q2.awaitTermination()
    CdcStream.drainCompaction("cont")

    assert(tableState(table) == oracleState(total),
      "continuous-trigger run with live arrivals + kill/restart diverged")
    // lineage epochs contiguous (healing covers the kill window)
    val eps = metrics.read().where($"query_id" === "cont")
      .orderBy("epoch_id").select("epoch_id").as[Long].collect().toSeq
    assert(eps == (0L to table.fence("cont")), s"lineage epochs not contiguous: $eps")
  }
}
