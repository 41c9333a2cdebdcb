package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Access to the session's `private[sql]` extensions object — the mutable
  * rule/function registry a session's analyzer is built from. Used by
  * graft.sql.GraftSql.attach to retrofit the graft rules onto a session
  * that was constructed without `spark.sql.extensions`. */
object SessionBridge {
  def extensionsOf(spark: SparkSession): SparkSessionExtensions =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].extensions

  /** Plan a captured LogicalPlan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — how the DML commands re-plan their source field. */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  ): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-wrap a batch DataFrame as a STREAMING one (isStreaming = true) —
    * what MicroBatchExecution requires of a V1 `Source.getBatch` result.
    * Same mechanism as Spark's own FileStreamSource: the batch plan's
    * InternalRow RDD under a streaming-flagged logical relation (lazy — no
    * materialization here). */
  def asStreamingFrame(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse: re-wrap a streaming MICRO-BATCH DataFrame (as handed to a
    * V1 `Sink.addBatch`) as a plain batch frame over the already-planned
    * InternalRow RDD — Spark's own ForeachBatchSink mechanism. The sink can
    * then run an arbitrary multi-stage pipeline (repartition, staged write,
    * metadata probes) that the incremental streaming plan itself would
    * reject. */
  def asBatchFrame(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
