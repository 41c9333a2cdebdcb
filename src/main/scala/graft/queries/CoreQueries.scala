package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.exprs.RefFunctions

/** Operator-parity queries over the driver testdata (SURVEY.md §2), each
  * with a DuckDB-equivalent oracle. `events` stands in for the CDC stream
  * (key = user_id, ordering = (ts, event_id)); `lineitem`/`orders`/dims for
  * the reporting-side relational operators.
  *
  * Conventions: every computed column aliased identically in Spark and SQL;
  * double aggregates rounded to pin cross-engine FP; no timestamps in
  * outputs (cast to date strings); integer sums cast to BIGINT in DuckDB
  * (its SUM(int) returns HUGEINT).
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // LWW dedup — the engine's W2/top-1-per-key pattern (§7.3): latest event
    // per user by (ts, event_id), via max_by (one shuffle, no sort).
    "q_lww_latest" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          max_by(struct(col("event_id"), col("event_type"), col("value")),
            struct(col("ts"), col("event_id"))).as("w"))
        .select(
          col("user_id"),
          col("w.event_id").as("last_event_id"),
          col("w.event_type").as("last_event_type"),
          round(col("w.value"), 2).as("last_value"))
    }),

    // Full CDC merge semantics on a composite key with tombstones:
    // key=(user_id, event_type), op=D when value<10, LWW by (ts,event_id).
    "q_cdc_merge" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(max_by(struct(col("event_id"), col("value")),
          struct(col("ts"), col("event_id"))).as("w"))
        .where(col("w.value") >= 10.0)
        .select(col("user_id"), col("event_type"),
          col("w.event_id").as("event_id"),
          round(col("w.value"), 2).as("value"))
    }),

    // Hash-bucket partition routing (O7): deterministic md5-derived bucket
    // of the key, counts per bucket — the reference's URL-hash Partition.
    "q_bucket_route" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("bucket",
          pmod(conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
            .cast("long"), lit(8L)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), count_distinct(col("user_id")).as("n_users"))
    }),

    // Dead-letter error routing (O7 partition 0 analog): route events whose
    // JSON props fail the guard to an error channel, count per route.
    "q_error_route" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .withColumn("route",
          when(col("k").isNull, "error")
            .when(col("k") >= 80, "quarantine")
            .otherwise("ok"))
        .groupBy(col("route"))
        .agg(count(lit(1)).as("n"), coalesce(sum(col("k")), lit(0L)).as("sum_k"))
    }),

    // sha256 content verification projection (the north-rule per-row check).
    "q_content_hash" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), sha2(col("text"), 256).as("content_sha"))
    }),

    // TPC-H Q1 shape (A1 pivot-style aggregation). Round-7 note: a
    // pre-partition on the distinct-agg keys (one shared exchange, fully
    // parallel aggregation) was tried and measured a WASH (0.83 s warm both
    // ways — the raw-row exchange costs what the 3-task partial agg did),
    // so the canonical partial-agg-first shape is kept: it shuffles no more
    // bytes and is strictly better when keys do repeat.
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // exact integer arithmetic: double sums are summation-order-
          // dependent and flip round() at boundaries across engines
          sum(floor(col("l_quantity")).cast("long")).as("sum_qty"),
          sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("long"))
            .as("revenue_cents"),
          count(lit(1)).as("n_rows"),
          count_distinct(col("l_orderkey")).as("n_orders"))
    }),

    // Dim join chain (J1/J2): broadcast joins into grouped aggregates.
    "q_join_dims" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          // exact integer cents — avg(double) is summation-order-dependent
          // and flips round(.,2) at boundaries across engines
          sum(floor(col("c_acctbal") * 100).cast("long")).as("bal_cents"))
    }),

    // Top-1-per-group window (W2): best order per customer.
    "q_topk_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("best_price"))
    }),

    // Explode / UNNEST (J3, P4-family 1→N generators).
    "q_explode_tokens" -> ((s, dir) => {
      t(s, dir, "part")
        .select(explode(split(col("p_type"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
    }),

    // Ordered intra-group fold (A2): first event per user and first
    // 'purchase' per user — the firstReq/firstHtml pattern.
    "q_first_ordered" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          min_by(col("event_id"), struct(col("ts"), col("event_id"))).as("first_event_id"),
          min_by(when(col("event_type") === "purchase", col("event_id")),
            when(col("event_type") === "purchase", struct(col("ts"), col("event_id")))
          ).as("first_purchase_id"))
    }),

    // Client-pivot (A3 / the JS-UDF pivots): event_type → columns.
    "q_pivot_types" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error"),
          sum(when(col("event_type") === "purchase", floor(col("value") * 100).cast("long"))
            .otherwise(0L)).as("purchase_cents"))
    }),

    // Exact COUNT(DISTINCT) (A4).
    "q_countd" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
    }),

    // Global sort + deterministic limit (W1).
    "q_sort_limit" -> ((s, dir) => {
      t(s, dir, "documents")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
        .limit(50)
        .select(col("doc_id"), col("n_chars"))
    }),

    // Scalar parity under DuckDB cross-check: url hash + extension + type
    // chain (F1/F2/F5) over synthesized URLs.
    "q_url_scalars" -> ((s, dir) => {
      val exts = array(lit("js"), lit("png"), lit("css"), lit("html"), lit("woff"))
      t(s, dir, "documents")
        .withColumn("url",
          concat(lit("http://example.com/"), col("source"), lit("/f"),
            (col("doc_id") % 7).cast("string"), lit("."),
            element_at(exts, (col("doc_id") % 5 + 1).cast("int"))))
        .select(
          col("doc_id"),
          RefFunctions.getUrlHash(col("url")).as("url_hash"),
          RefFunctions.getExt(col("url")).as("ext"),
          RefFunctions.prettyType(lit(""), RefFunctions.getExt(col("url"))).as("ptype"))
    }),

    // Label formatting (F17): snake_case → PascalCase over two-word names
    // synthesized from event_type (the reference's transform display names).
    "q_label_format" -> ((s, dir) => {
      t(s, dir, "events")
        .select(concat(col("event_type"), lit("_rate")).as("raw")).distinct()
        .withColumn("label", RefFunctions.labelFormat(col("raw")))
    }),

    // Integer clamp semantics (F10) over derived values.
    "q_clamp" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("n", floor((col("value") - 100.0) * 1000.0).cast("long"))
        .withColumn("clamped", RefFunctions.clampInteger(col("n")))
        .groupBy(col("event_type"))
        .agg(
          count(col("clamped")).as("n_valid"),
          sum(when(col("clamped").isNull, 1L).otherwise(0L)).as("n_nulled"),
          sum(col("clamped")).as("sum_clamped"))
    }),

    // Canonical JSON through the custom Catalyst Expression (F11): a MESSY
    // multi-key nested document (spurious whitespace, nested object, array,
    // UTF-8, an invalid-JSON residue class) is canonicalized by the engine;
    // DuckDB independently constructs the expected canonical string from
    // the same columns — exercising key-order preservation, nesting, UTF-8
    // passthrough, number formatting, whitespace stripping and the
    // invalid→null contract (the pinned behaviors of the expression).
    "q_canonical_json" -> ((s, dir) => {
      val messy = concat(
        lit("{ \"z\" : "), (col("event_id") % 7).cast("string"),
        lit(" , \"a\" : { \"n\" : "), (col("user_id") % 100).cast("string"),
        lit(" , \"t\" : \"café ☃\" } , \"arr\" : [ 1 , "),
        (col("event_id") % 3).cast("string"), lit(" , \"x\" ] }"))
      val input = when(col("event_id") % 11 === 0, lit("{not json")).otherwise(messy)
      t(s, dir, "events")
        .select(col("event_id"),
          graft.exprs.CanonicalJson.canonicalJson(input).as("canon"))
    }),

    // Request-scalar chain (F3/F13/F14/F15): hostname regex keeps the port,
    // urlShort truncation, composite requestid, image-format chain.
    "q_request_scalars" -> ((s, dir) => {
      val exts = array(lit("jpg"), lit("png"), lit("webp"), lit("gif"), lit("bmp"))
      val e = t(s, dir, "events")
        .withColumn("ext", element_at(exts, (col("event_id") % 5 + 1).cast("int")))
        .withColumn("url",
          concat(lit("https://host"), (col("user_id") % 20).cast("string"),
            lit(".example.com:"), (lit(8000) + col("user_id") % 3).cast("string"),
            lit("/"), repeat(lit("p/"), (col("event_id") % 140).cast("int")),
            lit("img."), col("ext")))
      e.select(
        col("event_id"),
        RefFunctions.hostname(col("url")).as("host"),
        length(RefFunctions.urlShort(col("url"))).as("short_len"),
        RefFunctions.requestId(col("user_id"), col("event_id") % 100).as("request_id"),
        RefFunctions.getFormat(lit("image"), lit(""), col("ext")).as("format"))
    }),

    // Size guards (P10): rows over a byte threshold dropped pre-shuffle,
    // drops counted to the metrics side (the reference's 2MB/20MB guards).
    "q_size_guard" -> ((s, dir) => {
      val e = t(s, dir, "documents")
        .withColumn("oversize", octet_length(col("text")) > 300)
      e.groupBy(col("lang"))
        .agg(
          sum(when(col("oversize"), 1L).otherwise(0L)).as("dropped"),
          sum(when(!col("oversize"), 1L).otherwise(0L)).as("kept"),
          sum(when(!col("oversize"), octet_length(col("text")).cast("long"))
            .otherwise(0L)).as("kept_bytes"))
    }),

    // Ordered ARRAY_AGG (A5): event types per user ordered by recency —
    // the reference's "technologies ordered by origins" pattern.
    "q_array_agg_ordered" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(concat_ws(",",
          reverse(transform(
            sort_array(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")))).as("types_desc"))
    }),

    // Per-page aggregate_stats analog (A1/W3): within-group distinct count
    // + max-over-subgroup-counts (the reference's numDomains /
    // maxDomainReqs over one page's entries).
    "q_domain_stats" -> ((s, dir) => {
      val perDomain = t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_type"))
      perDomain.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_domains"),
          max(col("n_type")).as("max_domain_reqs"),
          sum(col("n_type")).as("total_reqs"))
    }),

    // expAge cache-lifetime chain (F12) over synthesized Cache-Control.
    "q_expage" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("cc",
          when(col("event_id") % 4 === 0, "no-cache")
            .when(col("event_id") % 4 === 1,
              concat(lit("max-age="), (col("event_id") % 100000).cast("string")))
            .when(col("event_id") % 4 === 2, "public, immutable")
            .otherwise(lit(null).cast("string")))
      e.withColumn("exp_age",
          RefFunctions.expAge(col("cc"), lit(null).cast("string"),
            lit(null).cast("string"), lit(0L)))
        .withColumn("bucket", RefFunctions.expAgeBucket(col("exp_age")))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("exp_age")).as("sum_age"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_lww_latest" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        |       round(value, 2) AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
        |      FROM events) WHERE rn = 1""".stripMargin,

    "q_cdc_merge" ->
      """SELECT user_id, event_type, event_id, round(value, 2) AS value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |                                   ORDER BY ts DESC, event_id DESC) rn
        |      FROM events) WHERE rn = 1 AND value >= 10.0""".stripMargin,

    "q_bucket_route" ->
      """SELECT cast(concat('0x', substr(md5(cast(user_id AS VARCHAR)), 1, 4)) AS BIGINT) % 8 AS bucket,
        |       count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1""".stripMargin,

    "q_error_route" ->
      """SELECT CASE WHEN k IS NULL THEN 'error' WHEN k >= 80 THEN 'quarantine' ELSE 'ok' END AS route,
        |       count(*) AS n, cast(coalesce(sum(k), 0) AS BIGINT) AS sum_k
        |FROM (SELECT cast(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY 1""".stripMargin,

    "q_content_hash" ->
      "SELECT doc_id, sha256(text) AS content_sha FROM documents",

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       cast(sum(cast(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |       cast(sum(cast(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q_join_dims" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |       cast(sum(cast(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,

    "q_topk_window" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS best_price
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |                                   ORDER BY o_totalprice DESC, o_orderkey ASC) rn
        |      FROM orders) WHERE rn = 1""".stripMargin,

    "q_explode_tokens" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(p_type, ' ')) AS token FROM part)
        |GROUP BY 1""".stripMargin,

    "q_first_ordered" ->
      """SELECT user_id,
        |       (array_agg(event_id ORDER BY ts ASC, event_id ASC))[1] AS first_event_id,
        |       (array_agg(event_id ORDER BY ts ASC, event_id ASC)
        |          FILTER (WHERE event_type = 'purchase'))[1] AS first_purchase_id
        |FROM events GROUP BY 1""".stripMargin,

    "q_pivot_types" ->
      """SELECT user_id,
        |       cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |       cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |       cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |       cast(sum(CASE WHEN event_type = 'purchase' THEN cast(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS purchase_cents
        |FROM events GROUP BY 1""".stripMargin,

    "q_countd" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    "q_sort_limit" ->
      """SELECT doc_id, n_chars FROM documents
        |ORDER BY n_chars DESC, doc_id ASC LIMIT 50""".stripMargin,

    "q_label_format" ->
      """SELECT DISTINCT event_type || '_rate' AS raw,
        |       array_to_string(list_transform(
        |         string_split(event_type || '_rate', '_'),
        |         w -> upper(w[1]) || lower(w[2:])), '') AS label
        |FROM events""".stripMargin,

    "q_url_scalars" ->
      """WITH u AS (
        |  SELECT doc_id,
        |         concat('http://example.com/', source, '/f', cast(doc_id % 7 AS VARCHAR), '.',
        |                (['js','png','css','html','woff'])[cast(doc_id % 5 AS INT) + 1]) AS url
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, url,
        |         CASE WHEN contains(CASE WHEN instr(url, '?') > 0 THEN
        |                 string_split(string_split(url, '?')[1], '/')[-1]
        |               ELSE string_split(url, '/')[-1] END, '.')
        |              AND length(string_split(CASE WHEN instr(url, '?') > 0 THEN
        |                 string_split(string_split(url, '?')[1], '/')[-1]
        |               ELSE string_split(url, '/')[-1] END, '.')[-1]) <= 5
        |         THEN string_split(CASE WHEN instr(url, '?') > 0 THEN
        |                 string_split(string_split(url, '?')[1], '/')[-1]
        |               ELSE string_split(url, '/')[-1] END, '.')[-1]
        |         ELSE '' END AS ext
        |  FROM u)
        |SELECT doc_id,
        |       cast(concat('0x', substr(md5(url), 1, 4)) AS BIGINT) AS url_hash,
        |       ext,
        |       CASE WHEN ext IN ('js','json') THEN 'script'
        |            WHEN ext IN ('eot','ttf','woff','woff2','otf') THEN 'font'
        |            WHEN ext IN ('png','gif','jpg','jpeg','webp','ico','svg','avif','jxl','heic','heif') THEN 'image'
        |            WHEN ext = 'css' THEN 'css'
        |            WHEN ext = 'xml' THEN 'xml'
        |            WHEN ext IN ('mp4','webm','ts','m4v','m4s','mov','ogv','swf','f4v','flv') THEN 'video'
        |            WHEN ext = 'wasm' THEN 'wasm'
        |            WHEN ext IN ('html','htm') THEN 'html'
        |            ELSE 'other' END AS ptype
        |FROM e""".stripMargin,

    "q_clamp" ->
      """SELECT event_type,
        |       count(clamped) AS n_valid,
        |       cast(sum(CASE WHEN clamped IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulled,
        |       cast(sum(clamped) AS BIGINT) AS sum_clamped
        |FROM (SELECT event_type,
        |             CASE WHEN cast(floor((value - 100.0) * 1000.0) AS BIGINT) < 0 THEN NULL
        |                  ELSE cast(floor((value - 100.0) * 1000.0) AS BIGINT) END AS clamped
        |      FROM events)
        |GROUP BY 1""".stripMargin,

    "q_canonical_json" ->
      """SELECT event_id,
        |       CASE WHEN event_id % 11 = 0 THEN NULL
        |            ELSE concat('{"z":', cast(event_id % 7 AS VARCHAR),
        |                        ',"a":{"n":', cast(user_id % 100 AS VARCHAR),
        |                        ',"t":"café ☃"},"arr":[1,',
        |                        cast(event_id % 3 AS VARCHAR), ',"x"]}')
        |       END AS canon
        |FROM events""".stripMargin,

    "q_request_scalars" ->
      """WITH e AS (
        |  SELECT event_id, user_id,
        |         (['jpg','png','webp','gif','bmp'])[cast(event_id % 5 AS INT) + 1] AS ext
        |  FROM events),
        |u AS (
        |  SELECT event_id, user_id, ext,
        |         concat('https://host', cast(user_id % 20 AS VARCHAR), '.example.com:',
        |                cast(8000 + user_id % 3 AS VARCHAR), '/',
        |                repeat('p/', cast(event_id % 140 AS INT)), 'img.', ext) AS url
        |  FROM e)
        |SELECT event_id,
        |       regexp_extract(url, '(?:http|ws)s?://([^/]*)', 1) AS host,
        |       length(substr(url, 1, 255)) AS short_len,
        |       cast(user_id * 4294967296 + (event_id % 100) AS BIGINT) AS request_id,
        |       CASE WHEN ext = 'jpg' THEN 'jpg' WHEN ext = 'png' THEN 'png'
        |            WHEN ext = 'gif' THEN 'gif' WHEN ext = 'webp' THEN 'webp'
        |            ELSE '' END AS format
        |FROM u""".stripMargin,

    "q_size_guard" ->
      """SELECT lang,
        |       cast(sum(CASE WHEN oversize THEN 1 ELSE 0 END) AS BIGINT) AS dropped,
        |       cast(sum(CASE WHEN NOT oversize THEN 1 ELSE 0 END) AS BIGINT) AS kept,
        |       cast(sum(CASE WHEN NOT oversize THEN strlen(text) ELSE 0 END) AS BIGINT) AS kept_bytes
        |FROM (SELECT lang, text, strlen(text) > 300 AS oversize FROM documents)
        |GROUP BY 1""".stripMargin,

    "q_array_agg_ordered" ->
      """SELECT user_id,
        |       string_agg(event_type, ',' ORDER BY ts DESC, event_id DESC) AS types_desc
        |FROM events GROUP BY 1""".stripMargin,

    "q_domain_stats" ->
      """WITH d AS (
        |  SELECT user_id, event_type, count(*) AS n_type
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_domains,
        |       cast(max(n_type) AS BIGINT) AS max_domain_reqs,
        |       cast(sum(n_type) AS BIGINT) AS total_reqs
        |FROM d GROUP BY 1""".stripMargin,

    "q_expage" ->
      """WITH e AS (
        |  SELECT CASE WHEN event_id % 4 = 0 THEN 'no-cache'
        |              WHEN event_id % 4 = 1 THEN concat('max-age=', cast(event_id % 100000 AS VARCHAR))
        |              WHEN event_id % 4 = 2 THEN 'public, immutable'
        |              ELSE NULL END AS cc
        |  FROM events),
        |a AS (
        |  SELECT CASE
        |           WHEN cc IS NOT NULL AND (contains(cc, 'must-revalidate') OR contains(cc, 'no-cache') OR contains(cc, 'no-store')) THEN 0
        |           WHEN cc IS NOT NULL AND regexp_extract(cc, '^max-age=(\d+)', 1) <> ''
        |             THEN cast(regexp_extract(cc, '^max-age=(\d+)', 1) AS BIGINT)
        |           ELSE 0 END AS exp_age
        |  FROM e)
        |SELECT CASE WHEN exp_age IS NULL THEN 'null'
        |            WHEN exp_age = 0 THEN '0'
        |            WHEN exp_age <= 86400 THEN '1d'
        |            WHEN exp_age <= 2592000 THEN '30d'
        |            WHEN exp_age <= 31536000 THEN '365d'
        |            ELSE 'more' END AS bucket,
        |       count(*) AS n, cast(sum(exp_age) AS BIGINT) AS sum_age
        |FROM a GROUP BY 1""".stripMargin
  )
}
