package graft.exprs

import com.fasterxml.jackson.core.JsonFactory
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical JSON re-serialization as a native Catalyst expression — the
  * engine's pinned equivalent of the reference's `to_json`
  * (`modules/import_all.py:415-448`): compact separators (no whitespace),
  * UTF-8 preserved (ensure_ascii=False), original key order preserved.
  * Invalid/empty JSON → null (the reference drops + logs such rows).
  *
  * Number formatting is pinned to Jackson's shortest round-trip form; the
  * reference itself documents float-format divergence between serializers
  * (`modules/import_all.py:427-439`), so ONE canonical form is the contract.
  *
  * Null-safe unary expression; `doGenCode` emits a static call so the hot
  * path stays inside whole-stage codegen (no interpreted fallback).
  */
case class CanonicalJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val out = CanonicalJson.canonicalize(input.asInstanceOf[UTF8String].toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CanonicalJson.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |String _canon = $cls.canonicalize($c.toString());
         |if (_canon == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(_canon);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CanonicalJson =
    copy(child = newChild)

  override def prettyName: String = "canonical_json"
}

object CanonicalJson {
  // ObjectMapper is thread-safe after configuration
  private val mapper: ObjectMapper = new ObjectMapper(new JsonFactory())

  /** Parse and compactly re-serialize; null for blank or invalid input. */
  def canonicalize(s: String): String = {
    if (s == null || s.trim.isEmpty) null
    else
      try mapper.writeValueAsString(mapper.readTree(s))
      catch { case _: Exception => null }
  }

  /** Column-API entry point (Spark 4: Column↔Expression via bridge). */
  def canonicalJson(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.toColumn(CanonicalJson(ColumnBridge.toExpression(c)))
  }

  /** Register as a SQL function `canonical_json(str)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "canonical_json", exprs => CanonicalJson(exprs.head), "built-in")
}
