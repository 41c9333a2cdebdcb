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
}
