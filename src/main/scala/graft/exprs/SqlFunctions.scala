package graft.exprs

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.ColumnBridge

/** SQL bindings for the engine's scalar library: every reference-parity
  * function becomes a plain SQL function (`SELECT get_ext(url) ...`) whose
  * body is the SAME Catalyst expression tree the Column API builds — full
  * whole-stage codegen, zero UDF wrappers. A reference user who writes SQL
  * (its reporting path is pure SQL, `modules/constants.py:119-409`) gets
  * the whole surface without touching the Scala API. */
object SqlFunctions {

  def registerAll(spark: SparkSession): Unit = {
    def reg(name: String, arity: Int)(f: Seq[Column] => Column): Unit =
      ColumnBridge.registerFunction(spark, name, (exprs: Seq[Expression]) => {
        require(exprs.length == arity, s"$name expects $arity argument(s)")
        f(exprs.map(ColumnBridge.toColumn))
      })

    reg("get_ext", 1)(a => RefFunctions.getExt(a(0)))
    reg("pretty_type", 2)(a => RefFunctions.prettyType(a(0), a(1)))
    reg("get_format", 3)(a => RefFunctions.getFormat(a(0), a(1), a(2)))
    reg("get_url_hash", 1)(a => RefFunctions.getUrlHash(a(0)))
    reg("hash_url", 1)(a => RefFunctions.hashUrl(a(0)))
    reg("clamp_integer", 1)(a => RefFunctions.clampInteger(a(0)))
    reg("crawl_date", 1)(a => RefFunctions.crawlDate(a(0)))
    reg("client_name", 1)(a => RefFunctions.clientName(a(0)))
    reg("url_short", 1)(a => RefFunctions.urlShort(a(0)))
    reg("request_id", 2)(a => RefFunctions.requestId(a(0), a(1)))
    reg("hostname", 1)(a => RefFunctions.hostname(a(0)))
    reg("datetime_to_epoch", 1)(a => RefFunctions.datetimeToEpoch(a(0)))
    reg("exp_age", 4)(a => RefFunctions.expAge(a(0), a(1), a(2), a(3)))
    reg("exp_age_bucket", 1)(a => RefFunctions.expAgeBucket(a(0)))
    reg("is_home_page", 1)(a => RefFunctions.isHomePage(a(0)))
    reg("label_format", 1)(a => RefFunctions.labelFormat(a(0)))
    reg("canonical_json", 1)(a => CanonicalJson.canonicalJson(a(0)))
    PivotSumAggregator.register(spark) // pivot_sum(client, value) UDAF
  }
}
