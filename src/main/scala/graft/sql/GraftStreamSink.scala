package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink

import graft.cdc.LakeMerge
import graft.lake.LakeTable

/** `df.writeStream.format("graft").option("path", p).start()` — the SINK
  * twin of the changelog source: every micro-batch is one fenced LWW merge
  * commit (`LakeMerge.mergeBatch` with fence = (fenceId, batchId)), so the
  * sink is EXACTLY-ONCE under restart: a replayed epoch whose batchId is at
  * or below the table's committed fence is skipped before any work, the
  * same idempotent-commit contract the library's `CdcStream` path uses.
  *
  * Options:
  *  - `path` (required): the lake table directory; the table must exist
  *    (its schema is the contract — a sink must not invent one).
  *  - `fenceId`: logical stream identity for fencing. Defaults to the
  *    query's `checkpointLocation` — restarting FROM THE SAME CHECKPOINT
  *    resumes exactly-once. Deleting the checkpoint but keeping the
  *    fenceId makes re-numbered epochs fence out as already-applied
  *    (the standard (appId, version) idempotent-sink contract); LWW replay
  *    of the same EVENTS is idempotent anyway, so re-delivery converges.
  *  - `l0Mode` = true: append-only L0 ingest files (highest throughput,
  *    dedup deferred to flush/compaction) instead of per-batch dedup.
  *
  * The full-featured streaming path (lineage sidecar, dead-letter routing,
  * mart feeds, async compaction) remains `CdcStream.start`; this sink is
  * the plain Structured-Streaming surface for it. */
final class GraftStreamSink(
    spark: SparkSession, path: String, fenceId: String, l0Mode: Boolean)
  extends Sink {

  require(LakeTable.exists(path),
    s"not a lake table: $path — create it first (the table schema is the sink's contract)")

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val t = LakeTable.load(spark, path)
    // re-wrap as a batch frame (ForeachBatchSink mechanism): the merge is a
    // multi-stage pipeline the incremental streaming plan cannot host
    val batch = org.apache.spark.sql.graftshim.SessionBridge.asBatchFrame(data)
    LakeMerge.mergeBatch(t, batch, fence = Some((fenceId, batchId)), l0Mode = l0Mode)
    ()
  }

  override def toString: String = s"GraftStreamSink[$path, fence=$fenceId]"
}

object GraftStreamSink {
  def fromParameters(
      spark: SparkSession, parameters: Map[String, String]): GraftStreamSink = {
    val ci = parameters.map { case (k, v) => k.toLowerCase -> v }
    val path = ci.getOrElse("path", throw new IllegalArgumentException(
      "path required: writeStream.format(\"graft\").option(\"path\", dir)"))
    val fenceId = ci.get("fenceid")
      .orElse(ci.get("checkpointlocation"))
      .getOrElse(throw new IllegalArgumentException(
        "a stable stream identity is required for exactly-once fencing: " +
          "set option(\"checkpointLocation\", …) (usual) or option(\"fenceId\", …)"))
    new GraftStreamSink(spark, path, fenceId,
      l0Mode = ci.get("l0mode").exists(_.toBoolean))
  }
}
