package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.{CdcStream, EventGen, LakeMerge}
import graft.lake.LakeTable

/** Metadata-depth soak with REAL data (VERDICT r5 #5): 10^4 small
  * mergeBatch commits on one table — the commit count a 10^10-event
  * deployment implies — under the production maintenance cadence (minor
  * compaction, snapshot expiration, cost-based auto-rebucket). Emits one
  * JSON line per sample window with the metrics that must stay flat:
  *
  *   {"commit":N,"version":V,"snapshot_bytes":B,"manifests":M,
  *    "files":F,"lookup_files":L,"mean_commit_ms":W,"loadavg":X}
  *
  * and a final line {"soakmeta":"ok", ...} with the end-to-end facts plus
  * hard assertions (snapshot-bytes plateau, bounded lookup fan-in, flat
  * wall). The pure-metadata twin (seconds, CI-friendly) is SoakMetaSpec.
  *
  * Usage: runMain graft.SoakMeta [nCommits] [eventsPerCommit] [workDir]
  */
object SoakMeta {
  def main(args: Array[String]): Unit = {
    val nCommits = args.headOption.map(_.toInt).getOrElse(10000)
    val perCommit = args.lift(1).map(_.toInt).getOrElse(500)
    val work = args.lift(2).getOrElse(
      Files.createTempDirectory("graft-soakmeta").toString)
    val spark = SparkSession.builder()
      .master("local[8]") // small batches: full width is pure scheduling overhead
      .appName("graft-soakmeta")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t = LakeTable.create(spark, s"$work/table", CdcStream.binlogSchema,
      numBuckets = 8)
    // SampleEvery is a multiple of CompactEvery: samples land right AFTER a
    // minor compaction, measuring the steady-state floor the maintenance
    // cadence guarantees (mid-cadence a lookup legitimately sees up to
    // ~CompactEvery fresh deltas in its bucket — that is the knob, not a
    // leak; what must NOT happen is the floor growing with depth)
    val SampleEvery = 512
    val CompactEvery = 64
    val ExpireEvery = 256
    val Retain = 64
    val lookupKeys = Seq("repo_00003", "repo_00017", "repo_00042")
    def loadavg(): Double =
      try Files.readString(Paths.get("/proc/loadavg")).split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    def snapshotBytes(): Long =
      Files.size(Paths.get(s"$work/table", "metadata",
        s"v${t.currentVersion}.metadata.json"))
    def lookupFiles(): Double = {
      val snap = t.snapshot
      lookupKeys.map(k => t.filesForKey(snap, k).size).sum.toDouble / lookupKeys.size
    }

    var windowWall = 0.0
    var firstSample: Map[String, Double] = Map.empty
    var lastSample: Map[String, Double] = Map.empty
    (1 to nCommits).foreach { i =>
      val lo = (i - 1).toLong * perCommit
      val batch = EventGen.eventsRange(spark, lo, lo + perCommit,
        nRepos = 200, pathsPerRepo = 20, numPartitions = 2)
      val t0 = System.nanoTime()
      LakeMerge.mergeBatch(t, batch, Some(("soakmeta", i.toLong)),
        saltPartitions = 1)
      windowWall += (System.nanoTime() - t0) / 1e6
      if (i % CompactEvery == 0) {
        LakeMerge.compact(t, ifDeltasAtLeast = 4)
        // cost-based layout growth, exactly as the ingest loop runs it
        LakeMerge.maybeRebucket(t, targetBucketBytes = 8L * 1024 * 1024,
          maxBuckets = 64)
        ()
      }
      if (i % ExpireEvery == 0) { t.expireSnapshots(retainLast = Retain); () }
      if (i % SampleEvery == 0) {
        val s = Map[String, Double](
          "commit" -> i.toDouble,
          "version" -> t.currentVersion.toDouble,
          "snapshot_bytes" -> snapshotBytes().toDouble,
          "manifests" -> t.snapshot.manifests.size.toDouble,
          "files" -> t.snapshot.fileCount.toDouble,
          "num_buckets" -> t.snapshot.numBuckets.toDouble,
          "lookup_files" -> lookupFiles(),
          "mean_commit_ms" -> windowWall / SampleEvery,
          "loadavg" -> loadavg())
        println(s.toSeq.sortBy(_._1).map { case (k, v) =>
          f""""$k":$v%.1f""" }.mkString("{", ",", "}"))
        System.out.flush()
        if (firstSample.isEmpty) firstSample = s
        lastSample = s
        windowWall = 0.0
      }
    }

    // hard assertions — the flat-at-depth contract
    val first = firstSample
    val last = lastSample
    require(last("snapshot_bytes") <= first("snapshot_bytes") * 3,
      s"snapshot bytes must plateau: ${first("snapshot_bytes")} -> ${last("snapshot_bytes")}")
    require(last("manifests") <= 8.0 * t.snapshot.manifestGroups,
      s"manifest count must stay under the merge backstop: ${last("manifests")}")
    require(last("lookup_files") <= 24.0 &&
      last("lookup_files") <= math.max(first("lookup_files") * 1.5, 16.0),
      s"post-compaction point-lookup fan-in must stay at its floor: " +
        s"${first("lookup_files")} -> ${last("lookup_files")}")
    require(last("mean_commit_ms") <= math.max(first("mean_commit_ms"), 50.0) * 4,
      s"commit wall must stay flat: ${first("mean_commit_ms")} -> ${last("mean_commit_ms")}")
    // end-to-end correctness at depth: the resolved state matches the LWW
    // fold over the full regenerated stream
    val expected = graft.cdc.MergeEngine.liveView(graft.cdc.MergeEngine.dedupBatch(
      EventGen.eventsRange(spark, 0L, nCommits.toLong * perCommit,
        nRepos = 200, pathsPerRepo = 20)))
      .agg(count(lit(1)), sum(crc32(concat_ws("|", col("repo"), col("path"),
        col("commit"), col("lsn")))))
      .head()
    val got = LakeMerge.readState(t)
      .agg(count(lit(1)), sum(crc32(concat_ws("|", col("repo"), col("path"),
        col("commit"), col("lsn")))))
      .head()
    require(expected == got, s"state checksum mismatch at depth: $expected vs $got")
    println(s"""{"soakmeta":"ok","commits":$nCommits,"events":${nCommits.toLong * perCommit},""" +
      s""""final_version":${t.currentVersion},"num_buckets":${t.snapshot.numBuckets},""" +
      s""""state_rows":${got.getLong(0)},"work":"$work"}""")
    spark.stop()
  }
}
