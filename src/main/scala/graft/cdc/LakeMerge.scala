package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.{DataFileMeta, LakeTable}

/** Result of applying one batch onto the lake table. */
final case class CommitStats(
    applied: Boolean,
    epochId: Long,
    snapshotId: Long,
    batchRows: Long,
    touchedBuckets: Int,
    wallMs: Long
)

/** Key-partitioned MERGE INTO of change-event batches onto a [[LakeTable]]
  * (SURVEY.md §7.2/§7.3): LWW dedup + upsert, restricted to the hash-buckets
  * of `repo` the batch actually touches (partition pruning via lake
  * metadata), with epoch fencing for exactly-once replay and hot-repo
  * salting for write parallelism.
  */
object LakeMerge {

  /** Bucket assignment — the table's partition function. Deterministic pure
    * expression over `repo` (analog of the reference's URL-hash partition
    * routing, `modules/non_summary_pipeline.py:93-111`, minus the magic
    * error-partition index: parse failures are routed to a dead-letter
    * metric instead). */
  def bucketOf(repoCol: org.apache.spark.sql.Column, numBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(repoCol), lit(numBuckets.toLong)).cast("int")

  /** Consumer-facing current state: tombstones filtered, `op` dropped. */
  def readState(table: LakeTable): DataFrame =
    MergeEngine.liveView(table.read())

  /** Apply one batch of change events.
    *
    * @param fence   optional (queryId, epochId): skip as a no-op when the
    *                table has already committed this epoch (idempotent
    *                redelivery — reference's skip-if-populated rerun fence)
    * @param saltPartitions sub-splits per bucket for the shuffle-write of
    *                hot buckets (skew defusal, SURVEY.md §7.6)
    */
  def mergeBatch(
      table: LakeTable,
      batch: DataFrame,
      fence: Option[(String, Long)] = None,
      saltPartitions: Int = 4
  ): CommitStats = {
    val t0 = System.nanoTime()
    val (queryId, epochId) = fence.getOrElse(("adhoc", -1L))
    if (fence.isDefined && table.fence(queryId) >= epochId) {
      return CommitStats(applied = false, epochId, table.snapshot.snapshotId, 0L, 0, 0L)
    }

    val snap = table.snapshot
    val nBuckets = snap.numBuckets

    // additive / widening schema evolution driven by the incoming batch.
    // The table schema retains `op`: tombstones are stored (see
    // MergeEngine.apply scaladoc), filtered out by [[readState]].
    val schemaId = table.evolveSchema(batch.schema)
    val tableSchema = table.schema

    // 1. batch-local LWW winners (keeps op: winning tombstones still delete)
    val winners = MergeEngine.dedupBatch(batch)
      .withColumn("bucket", bucketOf(col("repo"), nBuckets))

    // 2. touched buckets (bounded by nBuckets, never by rows — driver-safe)
    val touched = winners.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet

    // 3. current state of touched buckets only (metadata partition pruning)
    val current = table.readBuckets(touched)
      .withColumn("bucket", bucketOf(col("repo"), nBuckets))

    // 4. resolve: union + single max_by aggregation (one shuffle);
    //    tombstones retained so late out-of-order upserts cannot resurrect
    val mergedCols = tableSchema.fieldNames.toSeq :+ "bucket"
    val resolved = MergeEngine.apply(
      current,
      winners
    ).select(mergedCols.map(col): _*)

    // 5. salt the write so one hot bucket still fans out across tasks;
    //    salt shapes the shuffle only — files land under bucket=<b> dirs
    val salted = resolved.repartition(
      col("bucket"),
      pmod(xxhash64(col("path")), lit(saltPartitions.toLong))
    )

    // 6. stage new files (invisible), then atomically swap metadata
    val staged = table.stage(salted, schemaId)
    val batchRows = staged.map(_.bytes).sum // placeholder weight; row counts live in lineage
    val committed = table.commit { s =>
      val kept = s.files.filterNot(f => touched.contains(f.bucket))
      s.copy(
        files = kept ++ staged,
        schemaId = math.max(s.schemaId, schemaId),
        fences = if (fence.isDefined) s.fences.updated(queryId, epochId) else s.fences,
        summary = Map(
          "operation" -> "merge",
          "touched-buckets" -> touched.size.toString,
          "added-files" -> staged.size.toString
        )
      )
    }
    CommitStats(
      applied = true,
      epochId = epochId,
      snapshotId = committed.snapshotId,
      batchRows = batchRows,
      touchedBuckets = touched.size,
      wallMs = (System.nanoTime() - t0) / 1000000L
    )
  }
}
