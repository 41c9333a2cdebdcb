package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator-parity surface: one entry per implemented
  * operator family (SURVEY.md §2 + training-data ops), each cross-checked
  * against DuckDB via `oracleSql` on the same parquet tables; entries with
  * no SQL equivalent (in-engine CDC replay, multimodal plumbing) get the
  * driver's rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The engine's signature shape: LWW dedup (latest change per key) feeding
    * an aggregation — the CDC merge pattern on the `events` stand-in. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val latest = CoreQueries.queries("q_lww_latest")(spark, dir)
    latest.groupBy(col("last_event_type"))
      .agg(count(lit(1)).as("n_keys"), round(sum(col("last_value")), 2).as("sum_value"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ DedupQueries.queries ++ TextQueries.queries ++
      SimilarityQueries.queries ++ CdcQueries.queries ++ ReportQueries.queries ++
      TransformQueries.queries ++ WindowQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ DedupQueries.oracleSql ++ TextQueries.oracleSql ++
      SimilarityQueries.oracleSql ++ CdcQueries.oracleSql ++ ReportQueries.oracleSql ++
      TransformQueries.oracleSql ++ WindowQueries.oracleSql
}
