package graft

import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries (noop sink, warm + repeats):
  * `sbt "runMain graft.QTime <sfDir> <reps> <query...>"` — the
  * iterate-on-one-query companion to Bench's full sweep. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val walls = (0 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.drop(1) // first run = warm
      println(f"[qtime] $name: min=${walls.min}%.3f s  runs=${walls.map(w => f"$w%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
