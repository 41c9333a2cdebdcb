package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.{CdcStream, EventGen, LakeMerge}
import graft.lake.LakeTable

/** Benchmark driver (BASELINE.md): headline operator queries at full local
  * parallelism, plus the authoritative north-rule evidence — the same
  * merge-apply replay job at two parallelism levels (the sandbox stand-in
  * for N vs 4N executors) on identical input, reporting events/sec at both
  * and scaling efficiency eff = T(N) / (4 × T(4N)).
  *
  * Methodology (see BASELINE.md for the analysis):
  *  - the whole JVM is pinned (taskset) to N CPUs for the small-"cluster"
  *    run — local[N] alone still lets shuffle/GC threads use every core
  *  - each configuration is warmed (codegen/JIT) with a small replay first
  *  - generation of the binlog is excluded from the timed window; the
  *    timed job = fenced delta-merge batches + final compaction (the full
  *    merge-apply of every event onto the resolved table)
  *
  * Prints ONE JSON line:
  * {"metric":"total","value":S,"unit":"sec","queries":{...},"sf":...,
  *  "scaling":{"events":N,"t_n":s,"t_4n":s,"eps_n":e,"eps_4n":e,
  *             "cores_n":8,"cores_4n":32,"efficiency":x}}
  */
object Bench {

  private val HeadlineQueries = Seq(
    "q_lww_latest", "q_cdc_merge", "q1_agg", "q_join_dims", "q_topk_window",
    "q_dedup_exact", "q_minhash_pairs", "q_simhash", "q_ngram_jaccard",
    "q_ann_topk", "q_ann_lsh", "q_token_count", "q_fingerprint",
    "q_content_hash", "q_cdc_replay")

  private val benchTmp = sys.env.getOrElse("GRAFT_BENCH_TMP",
    if (Files.isWritable(Paths.get("/dev/shm"))) "/dev/shm" else
      System.getProperty("java.io.tmpdir"))

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "10000")
      .config("spark.local.dir", s"$benchTmp/graft-spark-local")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Pin every thread of this JVM to the first `cores` CPUs. */
  private def pinCpus(cores: Int): Unit = {
    try {
      val pid = ProcessHandle.current().pid()
      new ProcessBuilder("taskset", "-a", "-pc", s"0-${cores - 1}", pid.toString)
        .redirectErrorStream(true).start().waitFor()
      ()
    } catch { case _: Exception => () } // taskset unavailable → unpinned
  }

  /** The north-rule job: replay `n` pre-generated change events onto a
    * fresh lake table via fenced delta-merge batches + final compaction.
    * Returns wall seconds of the merge-apply phase only. */
  private def replayJob(spark: SparkSession, binlogDir: String, n: Long,
      batches: Int, buckets: Int): Double = {
    val dir = Files.createTempDirectory(Paths.get(benchTmp), "graft-bench-table").toString
    val table = LakeTable.create(spark, s"$dir/table", CdcStream.binlogSchema,
      numBuckets = buckets)
    val per = n / batches
    val t0 = System.nanoTime()
    (0 until batches).foreach { b =>
      val lo = b * per
      val hi = if (b == batches - 1) n else (b + 1) * per
      val batch = spark.read
        .schema(CdcStream.binlogSchema)
        .parquet(binlogDir)
        .where(col("lsn") >= lo && col("lsn") < hi)
      LakeMerge.mergeBatch(table, batch, Some(("bench", b.toLong)),
        saltPartitions = 2)
    }
    LakeMerge.compact(table)
    val secs = (System.nanoTime() - t0) / 1e9
    rmTree(dir)
    secs
  }

  private def rmTree(dir: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      Files.walk(Paths.get(dir)).iterator().asScala.toList
        .reverse.foreach(Files.deleteIfExists(_))
    } catch { case _: Throwable => () }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaleEvents = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "8000000").toLong
    val coresN = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "8").toInt
    val cores4N = coresN * 4
    val buckets = 64
    val batches = 4

    // ---- phase 1: scaling evidence (N vs 4N cores, same input) ----
    val binlog = Files.createTempDirectory(Paths.get(benchTmp), "graft-bench-binlog").toString
    locally {
      val s = session(cores4N)
      EventGen.writeBinlog(s, binlog, scaleEvents, segments = 64,
        nRepos = 20000, pathsPerRepo = 200, skew = 2.0,
        langFromLsn = scaleEvents / 2)
      s.stop()
    }
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "2").toInt
    def timedReplay(cores: Int): Double = {
      pinCpus(cores)
      val s = session(cores)
      try {
        val warm = Files.createTempDirectory(Paths.get(benchTmp), "graft-bench-warm").toString
        EventGen.writeBinlog(s, warm, 100000L, segments = 8, nRepos = 1000,
          pathsPerRepo = 50)
        replayJob(s, warm, 100000L, 2, buckets)
        rmTree(warm)
        replayJob(s, binlog, scaleEvents, batches, buckets)
      } finally {
        s.stop()
        pinCpus(Runtime.getRuntime.availableProcessors())
      }
    }
    // best-of-K with INTERLEAVED repeats: the sandbox is a shared VM with
    // time-varying neighbor load; alternating N/4N runs keeps a busy window
    // from penalizing only one side, and the minimum wall per side is the
    // least contaminated estimate
    val runs = (0 until repeats).map(_ => (timedReplay(coresN), timedReplay(cores4N)))
    val tN = runs.map(_._1).min
    val t4N = runs.map(_._2).min
    rmTree(binlog)
    val epsN = scaleEvents / tN
    val eps4N = scaleEvents / t4N
    val eff = eps4N / (4.0 * epsN)

    // ---- phase 2: headline operator queries at full parallelism ----
    val spark = session(cores4N)
    val qmap = SparkEntry.queries
    val results = HeadlineQueries.flatMap { name =>
      qmap.get(name).map { fn =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
        catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    spark.stop()

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val scaling =
      f"""{"events":$scaleEvents,"cores_n":$coresN,"cores_4n":$cores4N,"t_n":$tN%.2f,"t_4n":$t4N%.2f,"eps_n":$epsN%.0f,"eps_4n":$eps4N%.0f,"efficiency":$eff%.3f}"""
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","scaling":$scaling}""")
  }
}
