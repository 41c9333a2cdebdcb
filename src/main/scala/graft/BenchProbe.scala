package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.{CdcStream, EventGen, LakeMerge}
import graft.lake.LakeTable

/** Diagnostic harness for the scaling bench: per-batch wall times at a
  * given core count. args: cores events batches [salt] [buckets] */
object BenchProbe {
  private def spark_table(t: LakeTable): LakeTable = t
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = args(1).toLong
    val batches = args(2).toInt
    val salt = if (args.length > 3) args(3).toInt else 4
    val buckets = if (args.length > 4) args(4).toInt else 64

    // pin the whole JVM to `cores` CPUs: local[N] alone still lets shuffle/
    // netty/GC threads use every core, which would under-state the honest
    // small-cluster wall time in the N vs 4N comparison
    if (sys.env.contains("GRAFT_PIN_CPUS")) {
      val pid = ProcessHandle.current().pid()
      val mask = s"0-${cores - 1}"
      new ProcessBuilder("taskset", "-a", "-pc", mask, pid.toString)
        .inheritIO().start().waitFor()
      System.err.println(s"[probe] pinned pid $pid to cpus $mask")
    }

    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    // GRAFT_MASTER=local-cluster[W,C,MB] runs REAL executor JVMs (the
    // honest multi-executor story); executors need our classpath + the
    // JDK17 add-opens flags
    val master = sys.env.getOrElse("GRAFT_MASTER", s"local[$cores]")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io", "java.base/java.net",
      "java.base/java.nio", "java.base/java.util",
      "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.executor.memory", sys.env.getOrElse("GRAFT_EXEC_MEM", "3g"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUF_MULT", "2").toInt.*(cores).toString)
      .config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("GRAFT_MAX_PART", "134217728"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "10000")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
      .config("spark.memory.offHeap.enabled", sys.env.getOrElse("GRAFT_OFFHEAP", "false"))
      .config("spark.memory.offHeap.size", "8g")
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("GRAFT_CODEC", "snappy"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("PROBE_STAGES")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
          if (dur > 300)
            System.err.println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
              f"wall=${dur / 1000.0}%6.2fs cpu=${si.taskMetrics.executorCpuTime / 1e9}%7.1fs " +
              f"run=${si.taskMetrics.executorRunTime / 1000.0}%7.1fs gc=${si.taskMetrics.jvmGCTime / 1000.0}%6.1fs " +
              f"spill=${si.taskMetrics.memoryBytesSpilled / 1e6}%6.0fMB ser=${si.taskMetrics.resultSerializationTime / 1000.0}%4.1fs " +
              f"fetchWait=${si.taskMetrics.shuffleReadMetrics.fetchWaitTime / 1000.0}%4.1fs shufWrite=${si.taskMetrics.shuffleWriteMetrics.writeTime / 1e9}%5.1fs ${si.name.take(30)}")
        }
      })
    }

    val dir = Files.createTempDirectory(
      java.nio.file.Paths.get(sys.env.getOrElse("GRAFT_BENCH_TMP", "/dev/shm")), "graft-probe").toString
    var t0 = System.nanoTime()
    EventGen.writeBinlog(spark, s"$dir/binlog", n, segments = 64,
      nRepos = 20000, pathsPerRepo = 200, skew = 2.0, langFromLsn = n / 2)
    System.err.println(f"[probe] gen: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    val l0 = sys.env.contains("GRAFT_L0") // shuffle-free L0 append mode
    val table = LakeTable.create(spark, s"$dir/table", CdcStream.binlogSchema, buckets)
    val per = n / batches
    val tAll = System.nanoTime()
    (0 until batches).foreach { b =>
      val lo = b * per
      val hi = if (b == batches - 1) n else (b + 1) * per
      t0 = System.nanoTime()
      val batch = spark.read.schema(CdcStream.binlogSchema)
        .parquet(s"$dir/binlog")
        .where(col("lsn") >= lo && col("lsn") < hi)
      val st = LakeMerge.mergeBatch(table, batch, Some(("probe", b.toLong)), salt, l0Mode = l0)
      System.err.println(f"[probe] batch $b: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(buckets=${st.touchedBuckets}, files=${table.files.size})")
    }
    t0 = System.nanoTime()
    LakeMerge.compact(table)
    System.err.println(f"[probe] compact: ${(System.nanoTime() - t0) / 1e9}%.2f s (files=${table.files.size})")
    t0 = System.nanoTime()
    // north-rule verification pass: per-row sha256(content) + order-free checksum
    val chk = LakeMerge.readState(spark_table(table))
      .select(sha2(concat_ws("|", col("repo"), col("path"), sha2(col("content"), 256)), 256).as("h"))
      .agg(sum(conv(substring(col("h"), 1, 15), 16, 10).cast("decimal(38,0)")).as("checksum"))
      .collect()(0)
    System.err.println(f"[probe] verify: ${(System.nanoTime() - t0) / 1e9}%.2f s checksum=${chk.get(0)}")
    val total = (System.nanoTime() - tAll) / 1e9
    System.err.println(f"[probe] cores=$cores total=$total%.2f s eps=${n / total}%.0f")
    spark.stop()
  }
}
