package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** Round-7 measurement harness (guide §1): times the SAME headline queries
  * as [[Bench]] phase 1 with the SAME session config and the SAME
  * methodology (noop sink, single untimed warmup of the first query, each
  * query timed COLD exactly once — the driver's shape), but additionally
  *  - supports `--reps K` to append K warm re-runs per query (separates
  *    fixed cost: planning + codegen + job setup, from data-proportional
  *    cost),
  *  - supports `--plans DIR` to dump `.explain("formatted")` per query,
  *  - `--only a,b,c` to time a subset.
  * Bench.scala itself is frozen; this harness exists so optimization
  * evidence can be gathered without touching it.
  */
object BenchExtra {

  private val HeadlineQueries = Seq(
    "q_lww_latest", "q_cdc_merge", "q1_agg", "q_join_dims", "q_topk_window",
    "q_dedup_exact", "q_minhash_pairs", "q_simhash", "q_ngram_jaccard",
    "q_ann_topk", "q_ann_lsh", "q_token_count", "q_fingerprint",
    "q_content_hash", "q_cdc_replay", "q_report_adoption")

  private val benchTmp = sys.env.getOrElse("GRAFT_BENCH_TMP",
    if (Files.isWritable(Paths.get("/dev/shm"))) "/dev/shm" else
      System.getProperty("java.io.tmpdir"))

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchextra-$cores")
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    var reps = 0
    var plansDir: Option[String] = None
    var only: Option[Set[String]] = None
    var confs: List[(String, String)] = Nil
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--plans" => plansDir = Some(args(i + 1)); i += 2
        case "--only" => only = Some(args(i + 1).split(",").toSet); i += 2
        case "--conf" => // diagnosis only: session-conf override k=v
          val Array(k, v) = args(i + 1).split("=", 2); confs ::= (k, v); i += 2
        case other => sys.error(s"unknown arg $other")
      }
    }
    // --only may name ANY SparkEntry query (plan dumps for non-headline
    // operators); default is the headline set in Bench order
    val names = only match {
      case Some(set) =>
        HeadlineQueries.filter(set.contains) ++
          set.toSeq.sorted.filterNot(HeadlineQueries.contains)
      case None => HeadlineQueries
    }
    sys.props("graft.skipOracleExport") = "true"

    def loadavg0(): Double =
      try Files.readString(Paths.get("/proc/loadavg")).split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }

    val spark = session(Runtime.getRuntime.availableProcessors())
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val qmap = SparkEntry.queries
    // untimed warmup — identical to Bench phase 1
    try qmap(HeadlineQueries.head)(spark, sfDir)
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }

    val loadAt = loadavg0()
    val results = names.map { name =>
      val fn = qmap(name)
      spark.sparkContext.setJobDescription(s"benchextra:$name")
      plansDir.foreach { d =>
        Files.createDirectories(Paths.get(d))
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(d, s"$name.txt"), plan.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      }
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val cold = (System.nanoTime() - t0) / 1e9
      val warm = (0 until reps).map { _ =>
        val w0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - w0) / 1e9
      }
      (name, cold, warm)
    }
    spark.stop()
    val qs = results.map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val warms = results.map { case (k, _, w) =>
      "\"" + k + "\":[" + w.map(x => f"$x%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total_cold","value":$total%.3f,"unit":"sec","queries":$qs,"warm":$warms,"sf":"$sfDir","loadavg":$loadAt%.2f}""")
  }
}
