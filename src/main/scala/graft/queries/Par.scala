package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.internal.SQLConf

/** Scan-parallelism guard (optimization guide §2.5 "input skew": one huge
  * unsplittable file → repartition immediately after the read).
  *
  * The driver benches single-file parquet tables (0.5–11 MB each) under
  * `spark.sql.files.maxPartitionBytes` = 16 MB, so every scan plans as 1–3
  * tasks on a 32-core box and downstream per-row work serializes onto one
  * core. For pipelines whose per-row cost dominates the exchange cost
  * (hundreds of md5s per row in the MinHash shingle pipeline, cosine folds
  * against a broadcast side), a round-robin repartition to default
  * parallelism is a large win; for cheap-per-row aggregations it is a
  * measured LOSS (the extra serialize/shuffle round-trip plus one more AQE
  * stage outweighs 32× parallelism on sub-second work), so it is applied
  * per-query, not in the shared readers.
  *
  * The partition estimate replicates FilePartition.maxSplitBytes from the
  * file's on-disk size — a pure metadata probe, no query planning (a
  * `df.rdd.getNumPartitions` probe measured ~0.1–0.4 s of re-planning per
  * call). At production scale (total bytes ≫ cores × maxPartitionBytes)
  * the condition is false and no exchange is added; results are unchanged
  * everywhere (consumers are order-insensitive, and Spark's
  * sort-before-repartition keeps row placement deterministic under retry).
  */
private[queries] object Par {

  /** Estimated scan-task count for `path`, per Spark's own split formula. */
  private def estScanTasks(s: SparkSession, path: String): Long = {
    val p = Paths.get(path)
    val bytes =
      if (Files.isDirectory(p))
        Files.list(p).mapToLong(f => if (Files.isRegularFile(f)) Files.size(f) else 0L).sum()
      else if (Files.isRegularFile(p)) Files.size(p)
      else return Long.MaxValue // unknown layout: assume wide, never spread
    val conf = SQLConf.get
    val defaultMaxSplit = conf.filesMaxPartitionBytes
    val openCost = conf.filesOpenCostInBytes
    val minPartitionNum = conf.filesMinPartitionNum
      .getOrElse(s.sparkContext.defaultParallelism)
    val bytesPerCore = (bytes + openCost) / math.max(1, minPartitionNum)
    val maxSplit = math.min(defaultMaxSplit, math.max(openCost, bytesPerCore))
    math.max(1L, (bytes + maxSplit - 1) / maxSplit)
  }

  /** Read `path` and spread it across the cluster iff its scan would plan
    * fewer tasks than half the default parallelism. */
  def spreadRead(s: SparkSession, path: String): DataFrame = {
    // Tables.reader: declared schema for the fixed test tables (by
    // basename — see its scaladoc), inference for everything else
    val df = Tables.reader(s, path)
    val par = s.sparkContext.defaultParallelism
    if (estScanTasks(s, path) < math.max(2, par / 2)) df.repartition(par) else df
  }
}
