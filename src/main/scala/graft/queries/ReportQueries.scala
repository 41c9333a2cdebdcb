package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.Mart
import graft.exprs.{HeaderOps, PivotSumAggregator, RefFunctions}

/** Reporting-surface queries (reference tech-report path) + the remaining
  * scalar-function parity oracles the round-1 verdict flagged as unit-only:
  *
  *  - q_report_adoption: the reference's adoption reporting query shape
  *    (`modules/constants.py:119-148`) composed END-TO-END: per-client
  *    COUNT(DISTINCT) → map-pivot via the typed [[PivotSumAggregator]] (the
  *    JS-UDF pivot replacement) → published through [[Mart.publish]]
  *    (idempotent content-keyed documents, the Firestore sink analog) →
  *    the stored documents are the verified output.
  *  - q_headers: parse_header multimap semantics (F4,
  *    `modules/utils.py:125-152`): case-insensitive names, 255-char value
  *    truncation, repeats appended, cookie sized-not-stored, "other
  *    headers" concat — DuckDB rebuilds each expected value independently.
  *  - q_datetime_epoch: lenient multi-format datetime parsing (F7,
  *    `modules/utils.py:182-189`): ISO / RFC-1123 / date-only / garbage→null.
  */
object ReportQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reference adoption shape: GROUP BY app, per-client distinct origins,
    // client pivot into {desktop, mobile}, published as idempotent keyed
    // documents. Scale: two hash aggregations + one tiny merge commit —
    // reporting inputs are pre-aggregated, never O(events) at the sink.
    "q_report_adoption" -> ((s, dir) => {
      PivotSumAggregator.register(s)
      val perClient = t(s, dir, "events")
        .withColumn("client",
          when(col("user_id") % 2 === 0, "desktop").otherwise("mobile"))
        .groupBy(col("event_type").as("app"), col("client"))
        .agg(count_distinct(col("user_id")).as("origins"))
      val adoption = perClient.groupBy(col("app"))
        .agg(expr("pivot_sum(client, origins)").as("m"))
        .select(col("app"),
          coalesce(element_at(col("m"), "desktop"), lit(0L)).as("desktop"),
          coalesce(element_at(col("m"), "mobile"), lit(0L)).as("mobile"))
      val root = java.nio.file.Files.createTempDirectory("graft-mart-adoption").toString
      val mart = Mart.martTable(s, root)
      Mart.publish(mart, adoption, keyCols = Seq("app"), "adoption", epoch = 1L)
      Mart.readDocs(mart, "adoption")
    }),

    // parse_header over a header array synthesized from events columns
    // (both engines build the identical array, then the engine applies the
    // HOF multimap pipeline while DuckDB reconstructs expected outputs).
    "q_headers" -> ((s, dir) => {
      val serverLen = (col("event_id") % 300 + 1).cast("int")
      val cookieLen = (col("event_id") % 50 + 1).cast("int")
      val headers = array(
        struct(lit("Content-Type").as("name"),
          concat(lit("text/"),
            when(col("event_id") % 2 === 0, "html").otherwise("css")).as("value")),
        struct(lit("COOKIE").as("name"), repeat(lit("c"), cookieLen).as("value")),
        struct(lit("X-Custom").as("name"),
          concat(lit("v"), (col("user_id") % 10).cast("string")).as("value")),
        struct(lit("Server").as("name"), repeat(lit("s"), serverLen).as("value")),
        struct(lit("server").as("name"), lit("dup").as("value")),
        struct(lit("Cookie").as("name"), lit("k=v").as("value"))
      )
      val e = t(s, dir, "events").withColumn("h", headers)
      val mm = HeaderOps.standardMultimap(col("h"), HeaderOps.respHeaders)
      e.select(
        col("event_id"),
        HeaderOps.joinedHeader(mm, "resp_content_type").as("content_type"),
        HeaderOps.joinedHeader(mm, "resp_server").as("server"),
        HeaderOps.cookieSize(col("h"), "cookie").as("cookie_size"),
        HeaderOps.otherHeaders(col("h"), HeaderOps.respHeaders, "cookie").as("other_headers"))
    }),

    // Reference page_weight shape (`modules/constants.py:344-358`):
    // GROUP BY app, ARRAY_AGG(STRUCT(client, metrics)) collected and
    // pivoted into per-client columns via map_from_entries — the second
    // JS-pivot replacement form (A3), built-in HOFs instead of the typed
    // aggregator. Money/weight sums use exact integer cents so the DuckDB
    // cross-check is FP-divergence-free.
    "q_report_pageweight" -> ((s, dir) => {
      val perClient = t(s, dir, "events")
        .withColumn("client",
          when(col("user_id") % 2 === 0, "desktop").otherwise("mobile"))
        .groupBy(col("event_type").as("app"), col("client"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("cents"),
          count(lit(1)).as("n"))
      perClient.groupBy(col("app"))
        .agg(map_from_entries(collect_list(
          struct(col("client"), struct(col("cents"), col("n"))))).as("m"))
        .select(col("app"),
          col("m.desktop.cents").as("desktop_cents"),
          col("m.desktop.n").as("desktop_n"),
          col("m.mobile.cents").as("mobile_cents"),
          col("m.mobile.n").as("mobile_n"))
    }),

    // Reference technologies report shape (`modules/constants.py:360-403`):
    // broadcast dim join (J1) → exact COUNT(DISTINCT) per (category,
    // technology) (A4) → categories CTE joined back USING(category) (J2) →
    // ARRAY_AGG(technology ORDER BY origins DESC) (A5). End-to-end over
    // lineitem ⋈ part: category=brand, technology=type, origin=order.
    "q_report_technologies" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val part = t(s, dir, "part")
      val tech = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("category"), col("p_type").as("technology"))
        .agg(count_distinct(col("l_orderkey")).as("origins"))
      val cats = tech.groupBy(col("category"))
        .agg(sum(col("origins")).as("cat_origins"))
      // categories are a bounded domain (one row per brand) — broadcast the
      // aggregated side instead of letting unknown post-agg stats force a
      // sort-merge join of two shuffles
      tech.join(broadcast(cats), Seq("category"))
        .groupBy(col("category"), col("cat_origins"))
        .agg(concat_ws(",",
          transform(
            reverse(sort_array(collect_list(struct(col("origins"), col("technology"))))),
            x => x.getField("technology"))).as("techs_desc"))
    }),

    // Reference lighthouse shape (`modules/constants.py:191-208`): GROUP BY
    // app, per-client MEDIAN of a score + distinct origins, ARRAY_AGG(STRUCT)
    // collected and pivoted per client. Median over exact integer cents —
    // both engines interpolate the midpoint identically for integers.
    "q_report_lighthouse" -> ((s, dir) => {
      val perClient = t(s, dir, "events")
        .withColumn("client",
          when(col("user_id") % 2 === 0, "desktop").otherwise("mobile"))
        .groupBy(col("event_type").as("app"), col("client"))
        .agg(
          round(expr("percentile(cast(floor(value * 100) as long), 0.5)"), 2)
            .as("median_cents"),
          count_distinct(col("user_id")).as("origins"))
      perClient.groupBy(col("app"))
        .agg(map_from_entries(collect_list(
          struct(col("client"), struct(col("median_cents"), col("origins"))))).as("m"))
        .select(col("app"),
          col("m.desktop.median_cents").as("desktop_median"),
          col("m.desktop.origins").as("desktop_origins"),
          col("m.mobile.median_cents").as("mobile_median"),
          col("m.mobile.origins").as("mobile_origins"))
    }),

    // Reference CWV shape (`modules/constants.py:265-290`): per (app,
    // client) the share of origins whose worst (max) metric clears a
    // threshold — a two-level aggregation (per-origin max, then per-group
    // distinct counts + conditional sum) pivoted per client. Exact integer
    // comparisons end-to-end.
    "q_report_cwv" -> ((s, dir) => {
      val perUser = t(s, dir, "events")
        .withColumn("client",
          when(col("user_id") % 2 === 0, "desktop").otherwise("mobile"))
        .groupBy(col("event_type").as("app"), col("client"), col("user_id"))
        .agg(max(floor(col("value") * 100).cast("long")).as("worst_cents"))
      val perClient = perUser.groupBy(col("app"), col("client"))
        .agg(count(lit(1)).as("origins"),
          sum(when(col("worst_cents") <= 15000L, 1L).otherwise(0L)).as("good_origins"))
      perClient.groupBy(col("app"))
        .agg(map_from_entries(collect_list(
          struct(col("client"), struct(col("origins"), col("good_origins"))))).as("m"))
        .select(col("app"),
          col("m.desktop.origins").as("desktop_origins"),
          col("m.desktop.good_origins").as("desktop_good"),
          col("m.mobile.origins").as("mobile_origins"),
          col("m.mobile.good_origins").as("mobile_good"))
    }),

    // Reference "technologies" LISTING shape (`modules/constants.py:292-309`):
    // the aggregated technologies joined INNER to a descriptions dim on the
    // technology name, SPLIT(category) carried as a JSON array, NULL-filled
    // similar_technologies, ordered by origins DESC — the sixth and last
    // reporting query of the reference's set. The descriptions dim is
    // synthesized identically on both sides (distinct p_type → text).
    "q_report_techlist" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val part = t(s, dir, "part")
      val tech = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("category"), col("p_type").as("technology"))
        .agg(count_distinct(col("l_orderkey")).as("origins"))
      val descriptions = part.select(col("p_type").as("technology")).distinct()
        .withColumn("description", concat(lit("All about "), col("technology")))
      tech.join(broadcast(descriptions), Seq("technology"))
        .select(
          col("technology"),
          col("description"),
          col("category"),
          to_json(split(col("category"), ",")).as("category_obj"),
          lit(null).cast("string").as("similar_technologies"),
          col("origins"))
        .orderBy(desc("origins"), col("technology"), col("category"))
    }),

    // Lenient datetime parsing: one format family per residue class; the
    // RFC-1123 weekday prefix is stripped by the engine (Spark 3+ cannot
    // parse EEE) and skipped by the oracle's format string.
    "q_datetime_epoch" -> ((s, dir) => {
      val dd = lpad((col("event_id") % 18 + 10).cast("string"), 2, "0")
      val hh = lpad((col("event_id") % 24).cast("string"), 2, "0")
      val mi = lpad((col("user_id") % 60).cast("string"), 2, "0")
      val iso = concat(lit("2023-05-"), dd, lit("T"), hh, lit(":"), mi, lit(":07"))
      val rfc = concat(lit("Tue, "), dd, lit(" May 2023 "), hh, lit(":"), mi, lit(":07 GMT"))
      val dateOnly = concat(lit("2024-03-"), dd)
      val dt = when(col("event_id") % 4 === 0, iso)
        .when(col("event_id") % 4 === 1, rfc)
        .when(col("event_id") % 4 === 2, dateOnly)
        .otherwise(lit("not a date"))
      t(s, dir, "events")
        .select(col("event_id"), RefFunctions.datetimeToEpoch(dt).as("epoch"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_report_adoption" ->
      """WITH pc AS (
        |  SELECT event_type AS app,
        |         CASE WHEN user_id % 2 = 0 THEN 'desktop' ELSE 'mobile' END AS client,
        |         count(DISTINCT user_id) AS origins
        |  FROM events GROUP BY 1, 2),
        |ad AS (
        |  SELECT app,
        |         cast(coalesce(sum(CASE WHEN client = 'desktop' THEN origins END), 0) AS BIGINT) AS desktop,
        |         cast(coalesce(sum(CASE WHEN client = 'mobile' THEN origins END), 0) AS BIGINT) AS mobile
        |  FROM pc GROUP BY 1)
        |SELECT sha256(app) AS doc_key,
        |       concat('{"app":"', app, '","desktop":', desktop, ',"mobile":', mobile, '}') AS doc_json,
        |       cast(1 AS BIGINT) AS publish_epoch
        |FROM ad""".stripMargin,

    "q_headers" ->
      """SELECT event_id,
        |       'text/' || CASE WHEN event_id % 2 = 0 THEN 'html' ELSE 'css' END AS content_type,
        |       substr(repeat('s', cast(event_id % 300 + 1 AS INT)), 1, 255) || ', dup' AS server,
        |       cast((event_id % 50 + 1) + 3 AS BIGINT) AS cookie_size,
        |       'X-Custom = v' || cast(user_id % 10 AS VARCHAR) AS other_headers
        |FROM events""".stripMargin,

    "q_report_pageweight" ->
      """WITH pc AS (
        |  SELECT event_type AS app,
        |         CASE WHEN user_id % 2 = 0 THEN 'desktop' ELSE 'mobile' END AS client,
        |         cast(sum(cast(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT app,
        |       max(CASE WHEN client = 'desktop' THEN cents END) AS desktop_cents,
        |       max(CASE WHEN client = 'desktop' THEN n END) AS desktop_n,
        |       max(CASE WHEN client = 'mobile' THEN cents END) AS mobile_cents,
        |       max(CASE WHEN client = 'mobile' THEN n END) AS mobile_n
        |FROM pc GROUP BY 1""".stripMargin,

    "q_report_technologies" ->
      """WITH tech AS (
        |  SELECT p.p_brand AS category, p.p_type AS technology,
        |         count(DISTINCT l.l_orderkey) AS origins
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |cats AS (
        |  SELECT category, cast(sum(origins) AS BIGINT) AS cat_origins
        |  FROM tech GROUP BY 1)
        |SELECT t.category, c.cat_origins,
        |       string_agg(t.technology, ',' ORDER BY t.origins DESC, t.technology DESC) AS techs_desc
        |FROM tech t JOIN cats c USING (category)
        |GROUP BY 1, 2""".stripMargin,

    "q_report_lighthouse" ->
      """WITH pc AS (
        |  SELECT event_type AS app,
        |         CASE WHEN user_id % 2 = 0 THEN 'desktop' ELSE 'mobile' END AS client,
        |         round(median(cast(floor(value * 100) AS BIGINT)), 2) AS median_cents,
        |         count(DISTINCT user_id) AS origins
        |  FROM events GROUP BY 1, 2)
        |SELECT app,
        |       max(CASE WHEN client = 'desktop' THEN median_cents END) AS desktop_median,
        |       max(CASE WHEN client = 'desktop' THEN origins END) AS desktop_origins,
        |       max(CASE WHEN client = 'mobile' THEN median_cents END) AS mobile_median,
        |       max(CASE WHEN client = 'mobile' THEN origins END) AS mobile_origins
        |FROM pc GROUP BY 1""".stripMargin,

    "q_report_cwv" ->
      """WITH pu AS (
        |  SELECT event_type AS app,
        |         CASE WHEN user_id % 2 = 0 THEN 'desktop' ELSE 'mobile' END AS client,
        |         user_id,
        |         max(cast(floor(value * 100) AS BIGINT)) AS worst_cents
        |  FROM events GROUP BY 1, 2, 3),
        |pc AS (
        |  SELECT app, client, count(*) AS origins,
        |         cast(sum(CASE WHEN worst_cents <= 15000 THEN 1 ELSE 0 END) AS BIGINT) AS good_origins
        |  FROM pu GROUP BY 1, 2)
        |SELECT app,
        |       max(CASE WHEN client = 'desktop' THEN origins END) AS desktop_origins,
        |       max(CASE WHEN client = 'desktop' THEN good_origins END) AS desktop_good,
        |       max(CASE WHEN client = 'mobile' THEN origins END) AS mobile_origins,
        |       max(CASE WHEN client = 'mobile' THEN good_origins END) AS mobile_good
        |FROM pc GROUP BY 1""".stripMargin,

    "q_report_techlist" ->
      """WITH tech AS (
        |  SELECT p.p_brand AS category, p.p_type AS technology,
        |         count(DISTINCT l.l_orderkey) AS origins
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |descr AS (
        |  SELECT DISTINCT p_type AS technology,
        |         'All about ' || p_type AS description
        |  FROM part)
        |SELECT t.technology, d.description, t.category,
        |       to_json(string_split(t.category, ',')) AS category_obj,
        |       cast(NULL AS VARCHAR) AS similar_technologies,
        |       t.origins
        |FROM tech t JOIN descr d USING (technology)
        |ORDER BY t.origins DESC, t.technology, t.category""".stripMargin,

    "q_datetime_epoch" ->
      """WITH x AS (
        |  SELECT event_id,
        |         lpad(cast(event_id % 18 + 10 AS VARCHAR), 2, '0') AS dd,
        |         lpad(cast(event_id % 24 AS VARCHAR), 2, '0') AS hh,
        |         lpad(cast(user_id % 60 AS VARCHAR), 2, '0') AS mi
        |  FROM events)
        |SELECT event_id,
        |       CASE cast(event_id % 4 AS INT)
        |         WHEN 0 THEN cast(epoch(strptime('2023-05-' || dd || ' ' || hh || ':' || mi || ':07', '%Y-%m-%d %H:%M:%S')) AS BIGINT)
        |         WHEN 1 THEN cast(epoch(strptime(dd || ' May 2023 ' || hh || ':' || mi || ':07 GMT', '%d %b %Y %H:%M:%S GMT')) AS BIGINT)
        |         WHEN 2 THEN cast(epoch(strptime('2024-03-' || dd, '%Y-%m-%d')) AS BIGINT)
        |         ELSE NULL END AS epoch
        |FROM x""".stripMargin
  )
}
