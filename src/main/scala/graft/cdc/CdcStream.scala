package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.lake.LakeTable

/** Structured-Streaming binlog tail → exactly-once lake MERGE (SURVEY.md
  * §7.2): a file source tails parquet binlog segments; every micro-batch is
  * applied via [[LakeMerge.mergeBatch]] under an epoch fence keyed by the
  * streaming queryId, then a lineage/metrics row is committed to a sidecar
  * lake table (§7.7). Restart from checkpoint replays the last unacked
  * batch; the fence turns the replay into a no-op, so the table reconverges
  * byte-identically (the reference's rerun-safety contract,
  * `data-pipeline.workflows.yaml:269-294`).
  */
object CdcStream {

  /** Binlog envelope schema (FIXTURES.md §2) for the streaming file source,
    * which requires a declared schema. `lang` nullable — events before the
    * evolution epoch simply lack it. */
  val binlogSchema: StructType = StructType(Seq(
    StructField("repo", StringType),
    StructField("path", StringType),
    StructField("commit", StringType),
    StructField("lsn", LongType),
    StructField("op", StringType),
    StructField("lang", StringType),
    StructField("content", StringType)
  ))

  val metricsSchema: StructType = StructType(Seq(
    StructField("metric_key", StringType), // sha256(queryId-epochId): idempotent upsert key
    StructField("query_id", StringType),
    StructField("epoch_id", LongType),
    StructField("snapshot_id", LongType),
    StructField("batch_rows", LongType),
    StructField("distinct_keys", LongType),
    StructField("deletes", LongType),
    StructField("touched_buckets", LongType),
    StructField("min_lsn", LongType),
    StructField("max_lsn", LongType),
    StructField("partition_offsets", StringType), // JSON [{part,minLsn,maxLsn,rows}]
    StructField("wall_ms", LongType)
  ))

  /** Open (or create) the lineage sidecar table. */
  def metricsTable(spark: SparkSession, root: String): LakeTable =
    if (LakeTable.exists(root)) LakeTable.load(spark, root)
    else LakeTable.create(spark, root, metricsSchema, numBuckets = 1)

  /** Start the replay: tail `binlogDir`, merge every micro-batch into
    * `table`, record lineage into `metrics`.
    *
    * @param queryId      stable logical id — the fencing key across restarts
    * @param availableNow drain-and-stop (replay semantics) vs continuous tail
    */
  def start(
      spark: SparkSession,
      table: LakeTable,
      metrics: LakeTable,
      binlogDir: String,
      checkpointDir: String,
      queryId: String,
      maxFilesPerTrigger: Int = 8,
      saltPartitions: Int = 4,
      availableNow: Boolean = true
  ): StreamingQuery = {
    val src = spark.readStream
      .schema(binlogSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(binlogDir)

    val writer = src.writeStream
      .queryName(queryId)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(table, metrics, batch, queryId, batchId, saltPartitions)
        ()
      }

    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }

  /** One fenced micro-batch: lineage stats → merge → data commit → metrics
    * commit. The batch is persisted once and feeds both the stats
    * aggregation and the merge (the reference's compute-once fan-out,
    * `modules/transformation.py:100-114`). */
  def applyBatch(
      table: LakeTable,
      metrics: LakeTable,
      batch: DataFrame,
      queryId: String,
      batchId: Long,
      saltPartitions: Int = 4,
      compactAtDeltas: Int = 8
  ): CommitStats = {
    if (table.fence(queryId) >= batchId) {
      // Redelivered epoch — exactly-once no-op for the DATA. But a crash in
      // the window between the data commit and the metrics commit leaves
      // the lineage row missing; the redelivered batch carries identical
      // content, so heal the sidecar from it before returning.
      if (metrics.fence(queryId) < batchId)
        recordLineage(table, metrics, batch, queryId, batchId,
          CommitStats(applied = true, batchId, table.snapshot.snapshotId, 0, 0, 0),
          System.nanoTime())
      return CommitStats(applied = false, batchId, table.snapshot.snapshotId, 0, 0, 0)
    }
    val t0 = System.nanoTime()
    batch.persist()
    try {
      val stats = LakeMerge.mergeBatch(table, batch, Some((queryId, batchId)), saltPartitions)
      // bounded read amplification: fold deltas into base once a bucket
      // accumulates compactAtDeltas delta files (single-writer: runs inside
      // the same foreachBatch serial loop as the merge commits)
      if (stats.applied && compactAtDeltas > 0)
        LakeMerge.compact(table, ifDeltasAtLeast = compactAtDeltas)

      if (stats.applied) recordLineage(table, metrics, batch, queryId, batchId, stats, t0)
      stats
    } finally {
      batch.unpersist()
      ()
    }
  }

  /** Compute and commit the lineage/metrics row for one epoch (§7.7):
    * per-partition offset ranges, row counts, snapshot id — keyed by
    * sha256(queryId-epochId) and fenced on the metrics table itself so the
    * sidecar is exactly-once too. */
  private def recordLineage(
      table: LakeTable,
      metrics: LakeTable,
      batch: DataFrame,
      queryId: String,
      batchId: Long,
      stats: CommitStats,
      t0: Long
  ): Unit = {
    val offs = batch
      .groupBy(spark_partition_id().as("part"))
      .agg(min("lsn").as("minLsn"), max("lsn").as("maxLsn"), count(lit(1)).as("rows"))
      .orderBy("part")
      .collect()
    val offsetsJson = offs.map { r =>
      s"""{"part":${r.getInt(0)},"minLsn":${r.getLong(1)},"maxLsn":${r.getLong(2)},"rows":${r.getLong(3)}}"""
    }.mkString("[", ",", "]")
    val agg = batch.agg(
      count(lit(1)).as("n"),
      count_distinct(col("repo"), col("path")).as("keys"),
      sum(when(col("op") === "D", 1L).otherwise(0L)).as("dels"),
      min("lsn").as("mn"), max("lsn").as("mx")
    ).collect()(0)
    val (n, keys, dels) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    val (mn, mx) = if (n == 0) (-1L, -1L) else (agg.getLong(3), agg.getLong(4))

    val spark = batch.sparkSession
    import spark.implicits._
    val key = org.apache.commons.codec.digest.DigestUtils.sha256Hex(s"$queryId-$batchId")
    val row = Seq((key, queryId, batchId, stats.snapshotId, n, keys, dels,
      stats.touchedBuckets.toLong, mn, mx, offsetsJson,
      (System.nanoTime() - t0) / 1000000L))
      .toDF(metricsSchema.fieldNames.toSeq: _*)
      .withColumn("bucket", lit(0))
    val staged = metrics.stage(row, 0)
    metrics.commit { s =>
      s.copy(files = s.files ++ staged,
        fences = s.fences.updated(queryId, batchId),
        summary = Map("operation" -> "append-metrics"))
    }
    ()
  }
}
