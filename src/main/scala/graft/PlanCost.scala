package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Diagnostic (guide §1): split each headline query's COLD cost into
  *  - build:   DataFrame construction (query function body, incl. any
  *             in-function actions like mart publishes / event generation)
  *  - plan:    analysis + optimization + physical planning (executedPlan)
  *  - exec:    the noop-sink action itself (includes AQE replans + codegen
  *             + JIT + the actual data work)
  * then repeats the whole query warm to show which component is one-time.
  * Measurement-only tool; never part of the bench artifact.
  */
object PlanCost {

  private val HeadlineQueries = Seq(
    "q_lww_latest", "q_cdc_merge", "q1_agg", "q_join_dims", "q_topk_window",
    "q_dedup_exact", "q_minhash_pairs", "q_simhash", "q_ngram_jaccard",
    "q_ann_topk", "q_ann_lsh", "q_token_count", "q_fingerprint",
    "q_content_hash", "q_cdc_replay", "q_report_adoption")

  private val benchTmp = sys.env.getOrElse("GRAFT_BENCH_TMP",
    if (Files.isWritable(Paths.get("/dev/shm"))) "/dev/shm" else
      System.getProperty("java.io.tmpdir"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val cores = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-plancost")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "10000")
      .config("spark.local.dir", s"$benchTmp/graft-spark-local")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.props("graft.skipOracleExport") = "true"

    val qmap = SparkEntry.queries
    // untimed warmup — identical to Bench phase 1
    try qmap(HeadlineQueries.head)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }

    def one(name: String): (Double, Double, Double) = {
      val fn = qmap(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimize+planning
      val t2 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t3 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
    }

    println(f"${"query"}%-20s ${"build_c"}%8s ${"plan_c"}%8s ${"exec_c"}%8s   ${"build_w"}%8s ${"plan_w"}%8s ${"exec_w"}%8s")
    HeadlineQueries.foreach { name =>
      val (bc, pc, ec) = one(name)
      val (bw, pw, ew) = one(name)
      println(f"$name%-20s $bc%8.3f $pc%8.3f $ec%8.3f   $bw%8.3f $pw%8.3f $ew%8.3f")
    }
    spark.stop()
  }
}
