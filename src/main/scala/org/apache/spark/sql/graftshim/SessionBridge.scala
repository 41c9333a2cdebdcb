package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Access to the session's `private[sql]` extensions object — the mutable
  * rule/function registry a session's analyzer is built from. Used by
  * graft.sql.GraftSql.attach to retrofit the graft rules onto a session
  * that was constructed without `spark.sql.extensions`. */
object SessionBridge {
  def extensionsOf(spark: SparkSession): SparkSessionExtensions =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].extensions
}
