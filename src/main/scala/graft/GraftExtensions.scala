package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The library's `SparkSessionExtensions` entry point: add
  * `spark.sql.extensions=graft.GraftExtensions` (spark-defaults, submit
  * conf, or builder) and every session gets the full reference-parity SQL
  * function surface with no code — the standard integration shape for
  * Spark extension libraries. Bodies are native Catalyst expression trees
  * (whole-stage codegen), not UDF wrappers.
  *
  * Also injects [[graft.sql.GraftTableResolution]], the analyzer rule that
  * makes `graft.sql.GraftCatalog` relations (SQL-over-lake-tables,
  * `VERSION AS OF`, `spark.read.format("graft")`) execute as the library's
  * own resolved-state plans. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.exprs.SqlFunctions.injectInto(ext)
    ext.injectResolutionRule(spark => new graft.sql.GraftTableResolution(spark))
  }
}
