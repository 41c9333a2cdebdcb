package graft.exprs

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.ColumnBridge

/** SQL bindings for the engine's scalar library: every reference-parity
  * function becomes a plain SQL function (`SELECT get_ext(url) ...`) whose
  * body is the SAME Catalyst expression tree the Column API builds — full
  * whole-stage codegen, zero UDF wrappers. A reference user who writes SQL
  * (its reporting path is pure SQL, `modules/constants.py:119-409`) gets
  * the whole surface without touching the Scala API.
  *
  * Two registration paths over ONE builder table:
  *  - [[registerAll]] — session-scoped temp functions for programmatic use;
  *  - [[injectInto]] — a `SparkSessionExtensions` hook, so
  *    `spark.sql.extensions=graft.GraftExtensions` wires the whole library
  *    into every new session with no code at all (the standard Spark
  *    extension-library integration point).
  */
object SqlFunctions {

  /** (name, arity, Column combinator) — the single source of truth both
    * registration paths share. */
  private val builders: Seq[(String, Int, Seq[Column] => Column)] = Seq(
    ("get_ext", 1, a => RefFunctions.getExt(a(0))),
    ("pretty_type", 2, a => RefFunctions.prettyType(a(0), a(1))),
    ("get_format", 3, a => RefFunctions.getFormat(a(0), a(1), a(2))),
    ("get_url_hash", 1, a => RefFunctions.getUrlHash(a(0))),
    ("hash_url", 1, a => RefFunctions.hashUrl(a(0))),
    ("clamp_integer", 1, a => RefFunctions.clampInteger(a(0))),
    ("crawl_date", 1, a => RefFunctions.crawlDate(a(0))),
    ("client_name", 1, a => RefFunctions.clientName(a(0))),
    ("url_short", 1, a => RefFunctions.urlShort(a(0))),
    ("request_id", 2, a => RefFunctions.requestId(a(0), a(1))),
    ("hostname", 1, a => RefFunctions.hostname(a(0))),
    ("datetime_to_epoch", 1, a => RefFunctions.datetimeToEpoch(a(0))),
    ("exp_age", 4, a => RefFunctions.expAge(a(0), a(1), a(2), a(3))),
    ("exp_age_bucket", 1, a => RefFunctions.expAgeBucket(a(0))),
    ("is_home_page", 1, a => RefFunctions.isHomePage(a(0))),
    ("label_format", 1, a => RefFunctions.labelFormat(a(0))),
    ("canonical_json", 1, a => CanonicalJson.canonicalJson(a(0)))
  )

  private def checked(name: String, arity: Int, f: Seq[Column] => Column)(
      exprs: Seq[Expression]): Column = {
    require(exprs.length == arity, s"$name expects $arity argument(s)")
    f(exprs.map(ColumnBridge.toColumn))
  }

  /** Session-scoped registration (temp functions + the pivot_sum UDAF). */
  def registerAll(spark: SparkSession): Unit = {
    builders.foreach { case (name, arity, f) =>
      ColumnBridge.registerFunction(spark, name, checked(name, arity, f))
    }
    PivotSumAggregator.register(spark) // pivot_sum(client, value) UDAF
  }

  /** Extension-point registration: inject every scalar as a built-in-grade
    * function into sessions created with `spark.sql.extensions`. The
    * Column→Expression conversion needs the ACTIVE session's converter, so
    * it is deferred to analysis time (when one always exists). pivot_sum is
    * a typed UDAF and needs a live session — [[registerAll]] covers it. */
  def injectInto(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, arity, f) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.exprs.RefFunctions", name),
        (exprs: Seq[Expression]) =>
          ColumnBridge.toSessionExpression(checked(name, arity, f)(exprs))))
    }
}
