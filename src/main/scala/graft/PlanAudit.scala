package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: prints the formatted plan of key queries so scan
  * pruning (PushedFilters/ReadSchema), join strategy (BroadcastHashJoin),
  * and codegen coverage (WholeStageCodegen spans) can be inspected.
  * `sbt "runMain graft.PlanAudit [sfDir] [query...]"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_lww_latest", "q1_agg", "q_join_dims", "q_ann_topk",
        "q_topk_window", "q_dedup_exact")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
