package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's `private[sql]` Column↔Expression conversion for
  * custom Catalyst expressions (the `new Column(expr)` / `col.expr` of
  * Spark ≤3 no longer exists). Lives under org.apache.spark.sql to satisfy
  * the access modifier — the standard pattern for Spark extension libraries.
  */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager Column→Expression conversion through the ACTIVE session's
    * converter (the lazy [[toExpression]] wrapper is Unevaluable — the
    * analyzer never descends into it). For extension-injected function
    * builders, which run during analysis when an active session is
    * guaranteed. */
  def toSessionExpression(c: Column): Expression =
    org.apache.spark.sql.SparkSession.active
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)

  /** Register a SQL function whose body is a Catalyst expression BUILDER —
    * Column-combinator libraries become plain SQL functions with full
    * codegen, no UDF wrapper (`FunctionRegistry` is `private[sql]`, hence
    * this shim). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Column): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // eager ColumnNode→Expression conversion: the lazy wrapper
    // (ExpressionUtils.expression) is Unevaluable and the analyzer does not
    // descend into it, so function builders must convert through the
    // session's converter
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => classic.expression(builder(exprs)), "scala_udf")
    ()
  }
}
