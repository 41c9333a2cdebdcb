package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: per-table cost of `spark.read.parquet` relation resolution
  * (file listing + parquet footer schema inference) vs an explicit-schema
  * read that skips inference. Driver-side only — no action is run. */
object SchemaCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-schemacost").config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Seq("lineitem", "orders", "customer", "nation", "region",
      "part", "events", "documents", "embeddings")
    // warm the FS/parquet classes once
    spark.read.parquet(s"$sfDir/nation.parquet").schema
    val schemas = tables.map(t => t -> spark.read.parquet(s"$sfDir/$t.parquet").schema).toMap
    (0 until 3).foreach { round =>
      println(s"-- round $round")
      tables.foreach { t =>
        val t0 = System.nanoTime()
        spark.read.parquet(s"$sfDir/$t.parquet").schema
        val t1 = System.nanoTime()
        spark.read.schema(schemas(t)).parquet(s"$sfDir/$t.parquet").queryExecution.analyzed
        val t2 = System.nanoTime()
        println(f"$t%-12s infer ${(t1 - t0) / 1e6}%7.1f ms   explicit ${(t2 - t1) / 1e6}%7.1f ms")
      }
    }
    spark.stop()
  }
}
