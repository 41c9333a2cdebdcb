package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{CdcStream, EventGen, LakeMerge, MergeEngine}
import graft.lake.LakeTable
import graft.util.Fs

/** The engine's own CDC operators exposed as driver queries. The replay
  * queries run the real generator + merge engine (and for the lake variant,
  * the full fenced snapshot-commit path) and return the final state keyed by
  * sha256(content).
  *
  * Each query EXPORTS its seeded input stream to a deterministic parquet
  * path under [[ExportRoot]] before replaying, so the DuckDB oracle can
  * recompute the expected final state independently: LWW winner per
  * (repo, path) over the total ordering (commit, lsn), tombstones dropped —
  * `row_number() OVER (PARTITION BY repo, path ORDER BY commit DESC, lsn
  * DESC) = 1 AND op <> 'D'` over `read_parquet(...)`. That upgrades the
  * engine's flagship replay path from a rows-only check to the same
  * hash-level oracle rigor as every relational query.
  */
object CdcQueries {

  /** Deterministic export location for the oracle's `read_parquet`. The
    * driver runs Verify and the DuckDB compare on the same host, so an
    * absolute tmp path is shared state between them (same mechanism as the
    * sfDir parquet views, minus the pre-registration). The oracle SQL below
    * embeds the SAME resolved root and is dumped per run into
    * oracle_sql.json, so driver and DuckDB always agree. Two CONCURRENT
    * Verify/Bench runs on one host would overwrite each other's exports —
    * give each its own root via GRAFT_ORACLE_EXPORT (env) or
    * -Dgraft.oracleExportRoot. */
  private val ExportRoot =
    sys.env.get("GRAFT_ORACLE_EXPORT")
      .orElse(sys.props.get("graft.oracleExportRoot"))
      .getOrElse("/tmp/graft-oracle-export")

  /** Bench runs these queries for TIMING, not for the DuckDB compare — the
    * oracle-input export is pure overhead there (measured ~0.4 s on
    * q_cdc_replay). Verify never sets the property, so the driver's
    * correctness gate always exports. */
  private def exportEnabled: Boolean =
    !sys.props.get("graft.skipOracleExport").contains("true")

  private def exportIf(df: DataFrame, path: String): Unit =
    if (exportEnabled) df.write.mode("overwrite").parquet(path)

  private val ReplayEvents = 40000L
  private val ReplayRepos = 200
  private val ReplayPaths = 20

  /** The LWW final-state oracle: winner per key by (commit, lsn), live rows
    * only — the SQL twin of MergeEngine.foldOracle. */
  private def lwwOracle(glob: String, select: String, tail: String = ""): String =
    s"""SELECT $select
       |FROM (SELECT *, row_number() OVER (PARTITION BY repo, path
       |                                   ORDER BY "commit" DESC, lsn DESC) rn
       |      FROM read_parquet('$glob'))
       |WHERE rn = 1 AND op <> 'D'$tail""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // In-memory batched LWW replay (no I/O): 4 batches folded through
    // MergeEngine, final live state with content hashes.
    "q_cdc_replay" -> ((s, _) => {
      val all = EventGen.events(s, ReplayEvents, nRepos = ReplayRepos,
        pathsPerRepo = ReplayPaths, langFromLsn = ReplayEvents / 2)
      exportIf(all, s"$ExportRoot/q_cdc_replay")
      var state = all.where(lit(false))
      val step = ReplayEvents / 4
      (0 until 4).foreach { b =>
        state = MergeEngine.apply(state,
          all.where(col("lsn") >= b * step && col("lsn") < (b + 1) * step))
      }
      MergeEngine.liveView(state)
        .select(col("repo"), col("path"), col("commit"), col("lsn"),
          col("lang"), sha2(col("content"), 256).as("content_sha"))
    }),

    // Full lake replay: binlog segments → streaming AvailableNow tail →
    // fenced merge commits → read back the live view. The binlog itself is
    // the oracle's input: written to a deterministic path, read by DuckDB.
    "q_cdc_lake_replay" -> ((s, _) => {
      val dir = s"$ExportRoot/q_cdc_lake_replay"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      EventGen.writeBinlog(s, s"$dir/binlog", 20000L, segments = 4,
        nRepos = 100, pathsPerRepo = 10, langFromLsn = 10000L)
      val table = LakeTable.create(s, s"$dir/table", CdcStream.binlogSchema, numBuckets = 8)
      val metrics = CdcStream.metricsTable(s, s"$dir/metrics")
      val q = CdcStream.start(s, table, metrics, s"$dir/binlog", s"$dir/ckpt",
        queryId = "verify-replay", maxFilesPerTrigger = 2)
      q.awaitTermination()
      LakeMerge.readState(table)
        .select(col("repo"), col("path"), col("commit"), col("lsn"),
          col("lang"), sha2(col("content"), 256).as("content_sha"))
    }),

    // Lineage/metrics sidecar rows from a replay (deterministic columns
    // only). maxFilesPerTrigger=1 + strictly increasing segment mtimes →
    // epoch i processes exactly segment i = lsn slice [i*2000, (i+1)*2000),
    // so DuckDB recomputes every lineage column from the binlog itself.
    "q_cdc_lineage" -> ((s, _) => {
      val dir = s"$ExportRoot/q_cdc_lineage"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      EventGen.writeBinlog(s, s"$dir/binlog", 8000L, segments = 4,
        nRepos = 50, pathsPerRepo = 8)
      val table = LakeTable.create(s, s"$dir/table", CdcStream.binlogSchema, numBuckets = 4)
      val metrics = CdcStream.metricsTable(s, s"$dir/metrics")
      val q = CdcStream.start(s, table, metrics, s"$dir/binlog", s"$dir/ckpt",
        queryId = "verify-lineage", maxFilesPerTrigger = 1)
      q.awaitTermination()
      metrics.read()
        .select(col("query_id"), col("epoch_id"), col("batch_rows"),
          col("distinct_keys"), col("deletes"), col("min_lsn"), col("max_lsn"))
        .orderBy(col("epoch_id"))
    }),

    // Changelog-driven INCREMENTAL mart refresh: full publish at epoch 0,
    // a second merge epoch changes some keys, refreshIncremental recomputes
    // ONLY the affected lang groups at epoch 1. The oracle recomputes both
    // the aggregates (over final LWW state) AND the expected publish epoch
    // per group — affected = langs of changed keys in the old state ∪ the
    // new state — so the incrementality itself is hash-verified, not just
    // the values.
    "q_mart_incremental" -> ((s, _) => {
      val full = EventGen.events(s, 6000L, nRepos = 40, pathsPerRepo = 5,
        langFromLsn = 0L)
      exportIf(full, s"$ExportRoot/q_mart_incremental")
      val dir = java.nio.file.Files.createTempDirectory("graft-martincr").toString
      val table = LakeTable.create(s, s"$dir/table", CdcStream.binlogSchema, numBuckets = 4)
      LakeMerge.mergeBatch(table, full.where(col("lsn") < 3000L), Some(("ingest", 0L)))
      val mart = graft.cdc.Mart.martTable(s, s"$dir/mart")
      val agg = (state: DataFrame) =>
        state.groupBy(col("lang")).agg(count(lit(1)).as("n_files"))
      graft.cdc.Mart.publish(mart, agg(LakeMerge.readState(table)), Seq("lang"), "bylang", 0L)
      val v0 = table.currentVersion
      LakeMerge.mergeBatch(table, full.where(col("lsn") >= 3000L), Some(("ingest", 1L)))
      graft.cdc.Mart.refreshIncremental(mart, table, v0, table.currentVersion,
        Seq("lang"), agg, "bylang", epoch = 1L)
      graft.cdc.Mart.readDocs(mart, "bylang").select(
        get_json_object(col("doc_json"), "$.lang").as("lang"),
        get_json_object(col("doc_json"), "$.n_files").cast("long").as("n_files"),
        col("publish_epoch"))
    }),

    // STREAMING-maintained reporting view: the binlog tail carries a
    // MartFeed, so every micro-batch incrementally catches the mart up
    // (Mart.catchUp: version-fenced refresh epochs). The oracle recomputes
    // the view body over the exported binlog's LWW winners — the streamed
    // view must equal the from-scratch aggregate.
    "q_mart_streaming" -> ((s, _) => {
      val dir = s"$ExportRoot/q_mart_streaming"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      EventGen.writeBinlog(s, s"$dir/binlog", 12000L, segments = 4,
        nRepos = 60, pathsPerRepo = 6, langFromLsn = 0L)
      val table = LakeTable.create(s, s"$dir/table", CdcStream.binlogSchema, numBuckets = 4)
      val metrics = CdcStream.metricsTable(s, s"$dir/metrics")
      val mart = graft.cdc.Mart.martTable(s, s"$dir/mart")
      val feed = CdcStream.MartFeed(mart, Seq("lang"),
        st => st.groupBy(col("lang")).agg(count(lit(1)).as("n_files"),
          max(col("lsn")).as("max_lsn")), "bylang")
      CdcStream.start(s, table, metrics, s"$dir/binlog", s"$dir/ckpt",
        queryId = "mart-stream", maxFilesPerTrigger = 1, martFeeds = Seq(feed))
        .awaitTermination()
      graft.cdc.Mart.readDocs(mart, "bylang").select(
        get_json_object(col("doc_json"), "$.lang").as("lang"),
        get_json_object(col("doc_json"), "$.n_files").cast("long").as("n_files"),
        get_json_object(col("doc_json"), "$.max_lsn").cast("long").as("max_lsn"))
    }),

    // SQL/catalog surface: the SAME replay read back through
    // `spark.sql("… FROM graft.ns.t")` — catalog resolution, the analyzer
    // substitution rule, and SQL-side sha2 all on the hash-oracled path
    // (the reference's SQL-as-source reporting shape,
    // `modules/tech_report_pipeline.py:156`).
    "q_sql_catalog" -> ((s, _) => {
      val dir = s"$ExportRoot/q_sql_catalog"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      val events = EventGen.events(s, 9000L, nRepos = 60, pathsPerRepo = 6,
        langFromLsn = 3000L)
      exportIf(events, s"$dir/events")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/wh/ns"))
      val table = LakeTable.create(s, s"$dir/wh/ns/t", CdcStream.binlogSchema, numBuckets = 8)
      LakeMerge.mergeBatch(table, events, Some(("sqlq", 0L)))
      val sql = graft.sql.GraftSql.attach(s, root = Some(s"$dir/wh"))
      sql.sql("""SELECT repo, path, `commit`, lsn, lang,
                |       sha2(content, 256) AS content_sha
                |FROM graft.ns.t""".stripMargin)
    }),

    // Time travel through SQL: merge two epochs, tag the first commit and
    // read VERSION AS OF the TAG — the oracle recomputes LWW over only the
    // first epoch's events, so snapshot isolation AND named-ref resolution
    // are hash-verified together.
    "q_sql_timetravel" -> ((s, _) => {
      val dir = s"$ExportRoot/q_sql_timetravel"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      val events = EventGen.events(s, 8000L, nRepos = 50, pathsPerRepo = 6,
        langFromLsn = 0L)
      exportIf(events, s"$dir/events")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/wh/ns"))
      val table = LakeTable.create(s, s"$dir/wh/ns/t", CdcStream.binlogSchema, numBuckets = 8)
      LakeMerge.mergeBatch(table, events.where(col("lsn") < 4000L), Some(("ttq", 0L)))
      table.setTag("epoch0")
      LakeMerge.mergeBatch(table, events.where(col("lsn") >= 4000L), Some(("ttq", 1L)))
      val sql = graft.sql.GraftSql.attach(s, root = Some(s"$dir/wh"))
      sql.sql(s"""SELECT lang, count(*) AS n_rows, max(lsn) AS max_lsn
                 |FROM graft.ns.t VERSION AS OF 'epoch0'
                 |GROUP BY lang""".stripMargin)
    }),

    // SQL WRITE surface: the same seeded stream fed through `INSERT INTO
    // graft.ns.t SELECT …` in two slices — the second slice UPDATES keys
    // the first wrote, so the hash compare verifies that SQL inserts run
    // the real LWW merge (upsert semantics), not a blind append. Deletes
    // are excluded from both sides: INSERT stamps op='U' (tombstones go
    // through the library/binlog path), so the oracle resolves LWW over
    // the same non-delete subset.
    "q_sql_insert" -> ((s, _) => {
      val dir = s"$ExportRoot/q_sql_insert"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      val events = EventGen.events(s, 8000L, nRepos = 50, pathsPerRepo = 6,
        langFromLsn = 2000L)
      // the input parquet IS both the INSERT source and the oracle's input
      events.write.mode("overwrite").parquet(s"$dir/input")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/wh/ns"))
      val sql = graft.sql.GraftSql.attach(s, root = Some(s"$dir/wh"))
      sql.sql("CREATE TABLE graft.ns.ins (repo STRING, path STRING, " +
        "`commit` STRING, lsn BIGINT, op STRING, lang STRING, content STRING) " +
        "TBLPROPERTIES ('buckets'='8')")
      sql.read.parquet(s"$dir/input").createOrReplaceTempView("q_sql_insert_src")
      sql.sql("""INSERT INTO graft.ns.ins
                |SELECT repo, path, `commit`, lsn, lang, content
                |FROM q_sql_insert_src WHERE lsn < 4000 AND op <> 'D'""".stripMargin)
      sql.sql("""INSERT INTO graft.ns.ins
                |SELECT repo, path, `commit`, lsn, lang, content
                |FROM q_sql_insert_src WHERE lsn >= 4000 AND op <> 'D'""".stripMargin)
      sql.sql("""SELECT repo, path, `commit`, lsn, lang,
                |       sha2(content, 256) AS content_sha
                |FROM graft.ns.ins""".stripMargin)
    }),

    // SQL DELETE: insert the stream (upserts only), DELETE a deterministic
    // key subset through the catalog, read back. The tombstones are
    // engine-fabricated (winner commit, lsn+1), so the oracle expresses the
    // NET effect instead: LWW winners of the non-delete input minus the
    // predicate-matched keys — the hash compare verifies the delete hit
    // exactly the matched keys and nothing else.
    "q_sql_delete" -> ((s, _) => {
      val dir = s"$ExportRoot/q_sql_delete"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      val events = EventGen.events(s, 8000L, nRepos = 50, pathsPerRepo = 6,
        langFromLsn = 2000L)
      events.write.mode("overwrite").parquet(s"$dir/input")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/wh/ns"))
      val sql = graft.sql.GraftSql.attach(s, root = Some(s"$dir/wh"))
      sql.sql("CREATE TABLE graft.ns.del (repo STRING, path STRING, " +
        "`commit` STRING, lsn BIGINT, op STRING, lang STRING, content STRING) " +
        "TBLPROPERTIES ('buckets'='8')")
      sql.read.parquet(s"$dir/input").createOrReplaceTempView("q_sql_delete_src")
      sql.sql("""INSERT INTO graft.ns.del
                |SELECT repo, path, `commit`, lsn, lang, content
                |FROM q_sql_delete_src WHERE op <> 'D'""".stripMargin)
      sql.sql("DELETE FROM graft.ns.del WHERE repo < 'repo_00010'")
      sql.sql("""SELECT repo, path, `commit`, lsn, lang,
                |       sha2(content, 256) AS content_sha
                |FROM graft.ns.del""".stripMargin)
    }),

    // SQL MERGE INTO: the canonical CDC statement. First slice inserted,
    // second slice applied via `MERGE … WHEN MATCHED THEN UPDATE SET * WHEN
    // NOT MATCHED THEN INSERT *` (the analyzer rewrites this shape to the
    // library's LWW merge), then `WHEN MATCHED THEN DELETE` tombstones a
    // deterministic key subset. Tombstones are engine-fabricated, so the
    // oracle expresses the net effect: LWW winners of the non-delete input
    // minus the deleted keys — hash-verifying that MERGE upserts resolve
    // and MERGE delete hit exactly the matched keys.
    "q_sql_merge" -> ((s, _) => {
      val dir = s"$ExportRoot/q_sql_merge"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      val events = EventGen.events(s, 8000L, nRepos = 50, pathsPerRepo = 6,
        langFromLsn = 2000L)
      events.write.mode("overwrite").parquet(s"$dir/input")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/wh/ns"))
      val sql = graft.sql.GraftSql.attach(s, root = Some(s"$dir/wh"))
      sql.sql("CREATE TABLE graft.ns.mrg (repo STRING, path STRING, " +
        "`commit` STRING, lsn BIGINT, op STRING, lang STRING, content STRING) " +
        "TBLPROPERTIES ('buckets'='8')")
      sql.read.parquet(s"$dir/input").createOrReplaceTempView("q_sql_merge_src")
      sql.sql("""INSERT INTO graft.ns.mrg
                |SELECT repo, path, `commit`, lsn, lang, content
                |FROM q_sql_merge_src WHERE lsn < 4000 AND op <> 'D'""".stripMargin)
      sql.sql("""MERGE INTO graft.ns.mrg t
                |USING (SELECT repo, path, `commit`, lsn, lang, content
                |       FROM q_sql_merge_src WHERE lsn >= 4000 AND op <> 'D') s
                |ON t.repo = s.repo AND t.path = s.path
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      // conditional PARTIAL-SET matched action (VERDICT r5 #1): only
      // matched winners passing the target-side condition are re-emitted,
      // with the subset SET applied at (winner commit, lsn+1); unmatched
      // condition rows stay untouched — the guard itself is hash-verified
      sql.sql("""MERGE INTO graft.ns.mrg t
                |USING (SELECT DISTINCT repo, path FROM q_sql_merge_src
                |       WHERE repo >= 'repo_00040') s
                |ON t.repo = s.repo AND t.path = s.path
                |WHEN MATCHED AND t.lang = 'scala'
                |  THEN UPDATE SET content = concat(t.content, '!'), lang = 'scala2'
                |""".stripMargin)
      // conditional matched DELETE: tombstone only the repo band the
      // condition selects (disjoint from the other slices' bands)
      sql.sql("""MERGE INTO graft.ns.mrg t
                |USING (SELECT DISTINCT repo, path FROM q_sql_merge_src) s
                |ON t.repo = s.repo AND t.path = s.path
                |WHEN MATCHED AND t.repo >= 'repo_00030' AND t.repo < 'repo_00035'
                |  THEN DELETE""".stripMargin)
      sql.sql("""MERGE INTO graft.ns.mrg t
                |USING (SELECT DISTINCT repo, path FROM q_sql_merge_src
                |       WHERE repo < 'repo_00008') s
                |ON t.repo = s.repo AND t.path = s.path
                |WHEN MATCHED THEN DELETE""".stripMargin)
      sql.sql("""SELECT repo, path, `commit`, lsn, lang,
                |       sha2(content, 256) AS content_sha
                |FROM graft.ns.mrg""".stripMargin)
    }),

    // MIRROR sync through MERGE (general decomposition): matched keys take
    // the source row (SET *), unmatched source keys insert, live target keys
    // ABSENT from the source are deleted (WHEN NOT MATCHED BY SOURCE) — the
    // classic replicate-a-table statement. The oracle is simply the LWW
    // winners of the source slice: every slice-1 key either gets replaced
    // (slice-2 ordering is strictly higher) or by-source-deleted.
    "q_sql_merge_mirror" -> ((s, _) => {
      val dir = s"$ExportRoot/q_sql_merge_mirror"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      val events = EventGen.events(s, 8000L, nRepos = 50, pathsPerRepo = 6,
        langFromLsn = 2000L)
      events.write.mode("overwrite").parquet(s"$dir/input")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/wh/ns"))
      val sql = graft.sql.GraftSql.attach(s, root = Some(s"$dir/wh"))
      sql.sql("CREATE TABLE graft.ns.mir (repo STRING, path STRING, " +
        "`commit` STRING, lsn BIGINT, op STRING, lang STRING, content STRING) " +
        "TBLPROPERTIES ('buckets'='8')")
      sql.read.parquet(s"$dir/input").createOrReplaceTempView("q_sql_mirror_src")
      sql.sql("""INSERT INTO graft.ns.mir
                |SELECT repo, path, `commit`, lsn, lang, content
                |FROM q_sql_mirror_src WHERE lsn < 4000 AND op <> 'D'""".stripMargin)
      sql.sql("""MERGE INTO graft.ns.mir t
                |USING (SELECT repo, path, `commit`, lsn, lang, content
                |       FROM q_sql_mirror_src WHERE lsn >= 4000 AND op <> 'D') s
                |ON t.repo = s.repo AND t.path = s.path
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *
                |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      sql.sql("""SELECT repo, path, `commit`, lsn, lang,
                |       sha2(content, 256) AS content_sha
                |FROM graft.ns.mir""".stripMargin)
    }),

    // SQL UPDATE: matched winners re-emitted as op='U' events with the SET
    // expressions applied at (commit, lsn+1). The oracle recomputes the net
    // effect — LWW winners with the SET applied AND lsn bumped on matched
    // rows — so both the payload rewrite and the fabricated ordering are
    // hash-verified.
    "q_sql_update" -> ((s, _) => {
      val dir = s"$ExportRoot/q_sql_update"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      val events = EventGen.events(s, 8000L, nRepos = 50, pathsPerRepo = 6,
        langFromLsn = 2000L)
      events.write.mode("overwrite").parquet(s"$dir/input")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/wh/ns"))
      val sql = graft.sql.GraftSql.attach(s, root = Some(s"$dir/wh"))
      sql.sql("CREATE TABLE graft.ns.upd (repo STRING, path STRING, " +
        "`commit` STRING, lsn BIGINT, op STRING, lang STRING, content STRING) " +
        "TBLPROPERTIES ('buckets'='8')")
      sql.read.parquet(s"$dir/input").createOrReplaceTempView("q_sql_update_src")
      sql.sql("""INSERT INTO graft.ns.upd
                |SELECT repo, path, `commit`, lsn, lang, content
                |FROM q_sql_update_src WHERE op <> 'D'""".stripMargin)
      sql.sql("""UPDATE graft.ns.upd
                |SET content = concat(content, '+'), lang = 'updated'
                |WHERE repo < 'repo_00008'""".stripMargin)
      sql.sql("""SELECT repo, path, `commit`, lsn, lang,
                |       sha2(content, 256) AS content_sha
                |FROM graft.ns.upd""".stripMargin)
    }),

    // STREAMING SINK surface: the binlog tailed through plain Structured
    // Streaming — `readStream.parquet → writeStream.format("graft")` —
    // every micro-batch one fenced LWW merge commit (exactly-once via the
    // (checkpointLocation, batchId) fence). Two AvailableNow runs over a
    // growing input prove checkpoint resume; the oracle resolves the whole
    // exported stream.
    "q_sql_sink" -> ((s, _) => {
      val dir = s"$ExportRoot/q_sql_sink"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      val events = EventGen.events(s, 8000L, nRepos = 50, pathsPerRepo = 6,
        langFromLsn = 4000L)
      events.where(col("lsn") < 4000L).coalesce(2)
        .write.mode("append").parquet(s"$dir/in")
      val table = LakeTable.create(s, s"$dir/table", CdcStream.binlogSchema, numBuckets = 8)
      def drain(): Unit = {
        val q = s.readStream.schema(CdcStream.binlogSchema).parquet(s"$dir/in")
          .writeStream.format("graft")
          .option("path", s"$dir/table")
          .option("checkpointLocation", s"$dir/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain()
      // second slice arrives; the restarted stream resumes from the fence
      events.where(col("lsn") >= 4000L).coalesce(2)
        .write.mode("append").parquet(s"$dir/in")
      drain()
      LakeMerge.readState(table)
        .select(col("repo"), col("path"), col("commit"), col("lsn"),
          col("lang"), sha2(col("content"), 256).as("content_sha"))
    }),

    // STATE-AS-STREAM: the table's changelog consumed through
    // `spark.readStream.format("graft")` (offsets = table versions,
    // AvailableNow drain), LWW-resolved — the hash compare proves the
    // streamed rows carry exactly the table's net state. The oracle
    // resolves the same seeded events directly.
    "q_sql_changelog" -> ((s, _) => {
      val dir = s"$ExportRoot/q_sql_changelog"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      val events = EventGen.events(s, 8000L, nRepos = 50, pathsPerRepo = 6,
        langFromLsn = 4000L)
      exportIf(events, s"$dir/events")
      val table = LakeTable.create(s, s"$dir/table", CdcStream.binlogSchema, numBuckets = 8)
      LakeMerge.mergeBatch(table, events.where(col("lsn") < 4000L), Some(("clq", 0L)))
      LakeMerge.mergeBatch(table, events.where(col("lsn") >= 4000L), Some(("clq", 1L)))
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
      val q = s.readStream.format("graft").option("startingVersion", 0)
        .load(s"$dir/table")
        .writeStream
        .foreachBatch((df: DataFrame, _: Long) => { df.collect().foreach(seen.add); () })
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      val streamed = s.createDataFrame(
        new java.util.ArrayList(seen.asScala.toSeq.asJava), CdcStream.binlogSchema)
      MergeEngine.liveView(MergeEngine.dedupBatch(streamed))
        .select(col("repo"), col("path"), col("commit"), col("lsn"),
          col("lang"), sha2(col("content"), 256).as("content_sha"))
    }),

    // CHANGELOG as SQL (VERDICT r5 #3): three merge epochs with a full
    // compaction in between — `FROM graft.ns.t.changes WHERE _change_version
    // > vA AND <= vB` must return exactly the middle epoch's change rows
    // (the compaction commit re-houses rows and contributes nothing),
    // LWW-resolved in SQL. The oracle recomputes over the middle lsn slice
    // of the exported stream, so both the version pruning and the
    // append-only classification are hash-verified.
    "q_sql_changes" -> ((s, _) => {
      val dir = s"$ExportRoot/q_sql_changes"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      val events = EventGen.events(s, 9000L, nRepos = 50, pathsPerRepo = 6,
        langFromLsn = 3000L)
      exportIf(events, s"$dir/events")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/wh/ns"))
      val table = LakeTable.create(s, s"$dir/wh/ns/t", CdcStream.binlogSchema,
        numBuckets = 8)
      LakeMerge.mergeBatch(table, events.where(col("lsn") < 3000L), Some(("chq", 0L)))
      val vA = table.currentVersion
      LakeMerge.mergeBatch(table,
        events.where(col("lsn") >= 3000L && col("lsn") < 6000L), Some(("chq", 1L)))
      val vB = table.currentVersion
      LakeMerge.compact(table)
      LakeMerge.mergeBatch(table, events.where(col("lsn") >= 6000L), Some(("chq", 2L)))
      val sql = graft.sql.GraftSql.attach(s, root = Some(s"$dir/wh"))
      sql.sql(s"""SELECT repo, path, `commit`, lsn, lang,
                 |       sha2(content, 256) AS content_sha
                 |FROM (SELECT *, row_number() OVER (PARTITION BY repo, path
                 |                                   ORDER BY `commit` DESC, lsn DESC) rn
                 |      FROM graft.ns.t.changes
                 |      WHERE _change_version > $vA AND _change_version <= $vB)
                 |WHERE rn = 1 AND op <> 'D'""".stripMargin)
    }),

    // INSERT OVERWRITE (VERDICT r5 #8): slice 1 inserted, then INSERT
    // OVERWRITE with slice 2 — ONE atomic REPLACE commit whose LWW-deduped
    // rows become the table's ENTIRE content (truncate-and-load; history
    // retained for time travel, changelog readers crossing it re-baseline —
    // spec-asserted). The live read after must show slice 2 alone, so the
    // oracle is simply the LWW winners of the overwrite source.
    "q_sql_overwrite" -> ((s, _) => {
      val dir = s"$ExportRoot/q_sql_overwrite"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      val events = EventGen.events(s, 8000L, nRepos = 50, pathsPerRepo = 6,
        langFromLsn = 2000L)
      events.write.mode("overwrite").parquet(s"$dir/input")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/wh/ns"))
      val sql = graft.sql.GraftSql.attach(s, root = Some(s"$dir/wh"))
      sql.sql("CREATE TABLE graft.ns.ovw (repo STRING, path STRING, " +
        "`commit` STRING, lsn BIGINT, op STRING, lang STRING, content STRING) " +
        "TBLPROPERTIES ('buckets'='8')")
      sql.read.parquet(s"$dir/input").createOrReplaceTempView("q_sql_ovw_src")
      sql.sql("""INSERT INTO graft.ns.ovw
                |SELECT repo, path, `commit`, lsn, lang, content
                |FROM q_sql_ovw_src WHERE lsn < 4000 AND op <> 'D'""".stripMargin)
      sql.sql("""INSERT OVERWRITE graft.ns.ovw
                |SELECT repo, path, `commit`, lsn, lang, content
                |FROM q_sql_ovw_src WHERE lsn >= 4000 AND op <> 'D'""".stripMargin)
      sql.sql("""SELECT repo, path, `commit`, lsn, lang,
                |       sha2(content, 256) AS content_sha
                |FROM graft.ns.ovw""".stripMargin)
    }),

    // True CDC ingestion through SQL (VERDICT r5 #8): raw change events —
    // FULL envelope, op included, tombstones and all — ingested via
    // `INSERT INTO graft.ns.t.cdc` in two slices (LWW resolution crosses
    // the commit boundary), then the resolved STATE read back as CDC events
    // through `SELECT … FROM graft.ns.t.cdc`: per-key LWW winner whatever
    // its kind, winning tombstones KEPT, op exposed. The oracle is the
    // same window with no tombstone filter.
    "q_sql_cdc" -> ((s, _) => {
      val dir = s"$ExportRoot/q_sql_cdc"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      val events = EventGen.events(s, 8000L, nRepos = 50, pathsPerRepo = 6,
        langFromLsn = 2000L)
      events.write.mode("overwrite").parquet(s"$dir/input")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/wh/ns"))
      val sql = graft.sql.GraftSql.attach(s, root = Some(s"$dir/wh"))
      sql.sql("CREATE TABLE graft.ns.cdct (repo STRING, path STRING, " +
        "`commit` STRING, lsn BIGINT, op STRING, lang STRING, content STRING) " +
        "TBLPROPERTIES ('buckets'='8')")
      sql.read.parquet(s"$dir/input").createOrReplaceTempView("q_sql_cdc_src")
      sql.sql("""INSERT INTO graft.ns.cdct.cdc
                |SELECT repo, path, `commit`, lsn, op, lang, content
                |FROM q_sql_cdc_src WHERE lsn < 4000""".stripMargin)
      sql.sql("""INSERT INTO graft.ns.cdct.cdc
                |SELECT repo, path, `commit`, lsn, op, lang, content
                |FROM q_sql_cdc_src WHERE lsn >= 4000""".stripMargin)
      sql.sql("""SELECT repo, path, `commit`, lsn, op, lang,
                |       sha2(content, 256) AS content_sha
                |FROM graft.ns.cdct.cdc""".stripMargin)
    }),

    // Zero-copy import (the 100 TB migration path): slice 1 ingested as raw
    // CDC events through SQL; slice 2 pre-written as plain parquet and
    // REGISTERED in place via CALL graft.add_files — hard-linked L0 files,
    // footer-lifted stats, one atomic commit, no data pages read. The final
    // read must be indistinguishable from having ingested both slices, so
    // the oracle is the LWW winners over the WHOLE input.
    "q_add_files" -> ((s, _) => {
      val dir = s"$ExportRoot/q_add_files"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      val events = EventGen.events(s, 8000L, nRepos = 50, pathsPerRepo = 6,
        langFromLsn = 2000L)
      events.write.mode("overwrite").parquet(s"$dir/input")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/wh/ns"))
      val sql = graft.sql.GraftSql.attach(s, root = Some(s"$dir/wh"))
      sql.sql("CREATE TABLE graft.ns.af (repo STRING, path STRING, " +
        "`commit` STRING, lsn BIGINT, op STRING, lang STRING, content STRING) " +
        "TBLPROPERTIES ('buckets'='8')")
      sql.read.parquet(s"$dir/input").createOrReplaceTempView("q_add_files_src")
      sql.sql("""INSERT INTO graft.ns.af.cdc
                |SELECT repo, path, `commit`, lsn, op, lang, content
                |FROM q_add_files_src WHERE lsn < 4000""".stripMargin)
      sql.read.parquet(s"$dir/input").where("lsn >= 4000")
        .select("repo", "path", "commit", "lsn", "op", "lang", "content")
        .write.mode("overwrite").parquet(s"$dir/ext")
      sql.sql(s"CALL graft.add_files('ns.af', '$dir/ext')")
      sql.sql("""SELECT repo, path, `commit`, lsn, lang,
                |       sha2(content, 256) AS content_sha
                |FROM graft.ns.af""".stripMargin)
    }),

    // Incremental materialized view through SQL: define with CALL
    // graft.create_mart over slice 1, ingest slice 2, CALL
    // graft.refresh_mart (changelog-driven incremental recompute of only
    // the affected groups — or cost-based re-baseline), read back TYPED via
    // graft.ns.m.view_<qid>. The oracle recomputes the aggregate directly
    // over the LWW winners of the whole input: the materialized detour must
    // be invisible in the result.
    "q_sql_mart" -> ((s, _) => {
      val dir = s"$ExportRoot/q_sql_mart"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      val events = EventGen.events(s, 8000L, nRepos = 50, pathsPerRepo = 6,
        langFromLsn = 2000L)
      events.write.mode("overwrite").parquet(s"$dir/input")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/wh/ns"))
      val sql = graft.sql.GraftSql.attach(s, root = Some(s"$dir/wh"))
      sql.sql("CREATE TABLE graft.ns.mvs (repo STRING, path STRING, " +
        "`commit` STRING, lsn BIGINT, op STRING, lang STRING, content STRING) " +
        "TBLPROPERTIES ('buckets'='8')")
      sql.read.parquet(s"$dir/input").createOrReplaceTempView("q_sql_mart_src")
      sql.sql("""INSERT INTO graft.ns.mvs.cdc
                |SELECT repo, path, `commit`, lsn, op, lang, content
                |FROM q_sql_mart_src WHERE lsn < 4000""".stripMargin)
      sql.sql("CALL graft.create_mart('ns.mvs', 'ns.mvm', 'bylang', " +
        "'SELECT lang, count(*) AS n_rows, max(lsn) AS max_lsn, " +
        "min(lsn) AS min_lsn FROM source GROUP BY lang', 'lang')")
      sql.sql("""INSERT INTO graft.ns.mvs.cdc
                |SELECT repo, path, `commit`, lsn, op, lang, content
                |FROM q_sql_mart_src WHERE lsn >= 4000""".stripMargin)
      sql.sql("CALL graft.refresh_mart('ns.mvm', 'bylang')")
      sql.sql("SELECT lang, n_rows, max_lsn, min_lsn FROM graft.ns.mvm.view_bylang")
    }),

    // Write-audit-publish: slice 1 ingested normally; slice 2 STAGED
    // (invisible — asserted), audited via the preview view, then published
    // in one atomic commit via CALL graft.wap_publish. The final read must
    // equal direct ingestion of both slices — the WAP detour is
    // semantically free.
    "q_wap" -> ((s, _) => {
      val dir = s"$ExportRoot/q_wap"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      val events = EventGen.events(s, 8000L, nRepos = 50, pathsPerRepo = 6,
        langFromLsn = 2000L)
      events.write.mode("overwrite").parquet(s"$dir/input")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/wh/ns"))
      val sql = graft.sql.GraftSql.attach(s, root = Some(s"$dir/wh"))
      sql.sql("CREATE TABLE graft.ns.wap (repo STRING, path STRING, " +
        "`commit` STRING, lsn BIGINT, op STRING, lang STRING, content STRING) " +
        "TBLPROPERTIES ('buckets'='8')")
      val input = sql.read.parquet(s"$dir/input")
        .select("repo", "path", "commit", "lsn", "op", "lang", "content")
      val t = graft.lake.LakeTable.load(s, s"$dir/wh/ns/wap")
      graft.cdc.LakeMerge.mergeBatch(t, input.where(col("lsn") < 4000L))
      graft.cdc.LakeMerge.wapStage(t, input.where(col("lsn") >= 4000L), "q")
      // staged = invisible; the SQL audit view previews the would-be state
      require(sql.sql("SELECT max(lsn) AS m FROM graft.ns.wap")
        .collect().head.getLong(0) < 4000L, "staged slice leaked pre-publish")
      require(sql.sql("SELECT max(lsn) AS m FROM graft.ns.wap.wap_q")
        .collect().head.getLong(0) >= 4000L, "audit view missing staged slice")
      sql.sql("CALL graft.wap_publish('ns.wap', 'q')").collect()
      sql.sql("""SELECT repo, path, `commit`, lsn, lang,
                |       sha2(content, 256) AS content_sha
                |FROM graft.ns.wap""".stripMargin)
    }),

    // Schema evolution through the lake: commit narrow batch, evolve, commit
    // wide batch, read reconciled (additive column + widened type), then
    // RENAME the evolved column (metadata-only — field-id reconciliation
    // keeps every already-written file readable under the new name, the
    // Iceberg rename contract) and aggregate by the NEW name. The batches
    // are contiguous slices of ONE seeded stream (lang null before lsn 2000
    // — exactly the narrow batch's dropped column), so the export is that
    // single stream and the oracle is plain LWW + group-by with an alias.
    "q_schema_evolution" -> ((s, _) => {
      import org.apache.spark.sql.types._
      val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
      val full = EventGen.events(s, 4000L, nRepos = 30, pathsPerRepo = 5,
        langFromLsn = 2000L)
      exportIf(full, s"$ExportRoot/q_schema_evolution")
      val narrow = StructType(Seq(
        StructField("repo", StringType), StructField("path", StringType),
        StructField("commit", StringType), StructField("lsn", IntegerType),
        StructField("op", StringType), StructField("content", StringType)))
      val table = LakeTable.create(s, s"$dir/table", narrow, numBuckets = 4)
      val b1 = full.where(col("lsn") < 2000L)
        .drop("lang").withColumn("lsn", col("lsn").cast("int"))
      LakeMerge.mergeBatch(table, b1, Some(("evolve", 0L)))
      val b2 = full.where(col("lsn") >= 2000L)
      LakeMerge.mergeBatch(table, b2, Some(("evolve", 1L)))
      table.renameColumn("lang", "language")
      LakeMerge.readState(table)
        .groupBy(col("language"))
        .agg(count(lit(1)).as("n_rows"), max(col("lsn")).as("max_lsn"))
    }),

    // Metadata-pruned point lookup through readRepo, across a bucket-layout
    // evolution: the key's bucket is probed under BOTH eras (4 and 16) and
    // per-file key blooms skip bucket companions — the same files a 100 TB
    // lookup would open. The resolved single-repo state is hash-checked
    // against the LWW oracle filtered to that repo.
    "q_point_lookup" -> ((s, _) => {
      val all = EventGen.events(s, 10000L, nRepos = 50, pathsPerRepo = 10,
        langFromLsn = 5000L)
      exportIf(all, s"$ExportRoot/q_point_lookup")
      val dir = java.nio.file.Files.createTempDirectory("graft-pointq").toString
      val table = LakeTable.create(s, s"$dir/table", CdcStream.binlogSchema,
        numBuckets = 4)
      LakeMerge.mergeBatch(table, all.where(col("lsn") < 5000L), Some(("pq", 0L)))
      table.rebucket(16)
      LakeMerge.mergeBatch(table, all.where(col("lsn") >= 5000L), Some(("pq", 1L)))
      LakeMerge.readRepo(table, "repo_00007")
        .select(col("repo"), col("path"), col("commit"), col("lsn"),
          col("lang"), sha2(col("content"), 256).as("content_sha"))
    }),

    // Multi-key point lookup through SQL (`repo IN (…)`) across a bucket-
    // layout evolution: each key's bucket is probed under BOTH eras and
    // per-file key blooms skip bucket companions, all through ONE read plan
    // — the metadata-pruned shape a 100 TB multi-entity lookup runs. The
    // resolved multi-repo state is hash-checked against the LWW oracle
    // filtered to the key set.
    "q_point_lookup_multi" -> ((s, _) => {
      val dir = s"$ExportRoot/q_point_lookup_multi"
      Fs.rmTree(java.nio.file.Paths.get(dir))
      val all = EventGen.events(s, 10000L, nRepos = 50, pathsPerRepo = 10,
        langFromLsn = 5000L)
      exportIf(all, s"$dir/events")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/wh/ns"))
      val table = LakeTable.create(s, s"$dir/wh/ns/t", CdcStream.binlogSchema,
        numBuckets = 4)
      LakeMerge.mergeBatch(table, all.where(col("lsn") < 5000L), Some(("pqm", 0L)))
      table.rebucket(16)
      LakeMerge.mergeBatch(table, all.where(col("lsn") >= 5000L), Some(("pqm", 1L)))
      val sql = graft.sql.GraftSql.attach(s, root = Some(s"$dir/wh"))
      sql.sql("""SELECT repo, path, `commit`, lsn, lang,
                |       sha2(content, 256) AS content_sha
                |FROM graft.ns.t
                |WHERE repo IN ('repo_00007', 'repo_00013', 'repo_00031')""".stripMargin)
    }),

    // Bucket-layout evolution mid-replay: batch 1 lands under 4 buckets,
    // rebucket(16) evolves the layout WITHOUT rewriting data, batch 2
    // (updates/deletes over batch 1's keys) lands under 16. The resolved
    // read crosses both eras; an all-buckets major then MIGRATES every file
    // to the current layout (exercising the evolution-aware tombstone-purge
    // guard en route) and the final state is hash-checked against the LWW
    // oracle over the raw exported events — wrong cross-era resolution,
    // wrong migration, or a wrongly-purged tombstone all hash-mismatch.
    "q_bucket_evolution" -> ((s, _) => {
      val all = EventGen.events(s, 12000L, nRepos = 60, pathsPerRepo = 8,
        langFromLsn = 6000L)
      exportIf(all, s"$ExportRoot/q_bucket_evolution")
      val dir = java.nio.file.Files.createTempDirectory("graft-evolveq").toString
      val table = LakeTable.create(s, s"$dir/table", CdcStream.binlogSchema,
        numBuckets = 4)
      LakeMerge.mergeBatch(table, all.where(col("lsn") < 6000L), Some(("evq", 0L)))
      table.rebucket(16)
      LakeMerge.mergeBatch(table, all.where(col("lsn") >= 6000L), Some(("evq", 1L)))
      LakeMerge.compactOnly(table, (0 until 16).toSet)
      require(table.files.forall(f =>
        graft.lake.LakeTable.layoutOf(f, table.snapshot) == 16),
        "all-buckets major must unify the bucket layout")
      LakeMerge.readState(table)
        .select(col("repo"), col("path"), col("commit"), col("lsn"),
          col("lang"), sha2(col("content"), 256).as("content_sha"))
    })
  )

  /** DuckDB oracles over the deterministic exports: the final replay state
    * IS SQL-expressible — arg-max per key over (commit, lsn), deletes
    * filtered (VERDICT r3 #1). */
  val oracleSql: Map[String, String] = Map(
    "q_cdc_replay" -> lwwOracle(
      s"$ExportRoot/q_cdc_replay/*.parquet",
      """repo, path, "commit", lsn, lang, sha256(content) AS content_sha"""),

    "q_cdc_lake_replay" -> lwwOracle(
      s"$ExportRoot/q_cdc_lake_replay/binlog/segment-*.parquet",
      """repo, path, "commit", lsn, lang, sha256(content) AS content_sha"""),

    "q_cdc_lineage" ->
      s"""SELECT 'verify-lineage' AS query_id,
         |       CAST(floor(lsn / 2000) AS BIGINT) AS epoch_id,
         |       count(*) AS batch_rows,
         |       count(DISTINCT repo || '|' || path) AS distinct_keys,
         |       count(*) FILTER (WHERE op = 'D') AS deletes,
         |       min(lsn) AS min_lsn, max(lsn) AS max_lsn
         |FROM read_parquet('$ExportRoot/q_cdc_lineage/binlog/segment-*.parquet')
         |GROUP BY 2""".stripMargin,

    "q_sql_catalog" -> lwwOracle(
      s"$ExportRoot/q_sql_catalog/events/*.parquet",
      """repo, path, "commit", lsn, lang, sha256(content) AS content_sha"""),

    "q_sql_timetravel" ->
      s"""SELECT lang, count(*) AS n_rows, max(lsn) AS max_lsn
         |FROM (SELECT *, row_number() OVER (PARTITION BY repo, path
         |                                   ORDER BY "commit" DESC, lsn DESC) rn
         |      FROM read_parquet('$ExportRoot/q_sql_timetravel/events/*.parquet')
         |      WHERE lsn < 4000)
         |WHERE rn = 1 AND op <> 'D'
         |GROUP BY lang""".stripMargin,

    "q_sql_sink" -> lwwOracle(
      s"$ExportRoot/q_sql_sink/in/*.parquet",
      """repo, path, "commit", lsn, lang, sha256(content) AS content_sha"""),

    "q_sql_changelog" -> lwwOracle(
      s"$ExportRoot/q_sql_changelog/events/*.parquet",
      """repo, path, "commit", lsn, lang, sha256(content) AS content_sha"""),

    "q_sql_delete" ->
      s"""SELECT repo, path, "commit", lsn, lang, sha256(content) AS content_sha
         |FROM (SELECT *, row_number() OVER (PARTITION BY repo, path
         |                                   ORDER BY "commit" DESC, lsn DESC) rn
         |      FROM read_parquet('$ExportRoot/q_sql_delete/input/*.parquet')
         |      WHERE op <> 'D')
         |WHERE rn = 1 AND NOT (repo < 'repo_00010')""".stripMargin,

    "q_sql_update" ->
      s"""SELECT repo, path, "commit",
         |       CASE WHEN repo < 'repo_00008' THEN lsn + 1 ELSE lsn END AS lsn,
         |       CASE WHEN repo < 'repo_00008' THEN 'updated' ELSE lang END AS lang,
         |       sha256(CASE WHEN repo < 'repo_00008' THEN content || '+'
         |              ELSE content END) AS content_sha
         |FROM (SELECT *, row_number() OVER (PARTITION BY repo, path
         |                                   ORDER BY "commit" DESC, lsn DESC) rn
         |      FROM read_parquet('$ExportRoot/q_sql_update/input/*.parquet')
         |      WHERE op <> 'D')
         |WHERE rn = 1""".stripMargin,

    // net effect of the four MERGE slices over disjoint repo bands:
    // [40,∞) ∧ lang='scala' → partial SET applied at lsn+1;
    // [30,35) → conditional-deleted; [0,8) → canonical-deleted
    "q_sql_merge" ->
      s"""SELECT repo, path, "commit",
         |       CASE WHEN repo >= 'repo_00040' AND lang = 'scala'
         |            THEN lsn + 1 ELSE lsn END AS lsn,
         |       CASE WHEN repo >= 'repo_00040' AND lang = 'scala'
         |            THEN 'scala2' ELSE lang END AS lang,
         |       sha256(CASE WHEN repo >= 'repo_00040' AND lang = 'scala'
         |              THEN content || '!' ELSE content END) AS content_sha
         |FROM (SELECT *, row_number() OVER (PARTITION BY repo, path
         |                                   ORDER BY "commit" DESC, lsn DESC) rn
         |      FROM read_parquet('$ExportRoot/q_sql_merge/input/*.parquet')
         |      WHERE op <> 'D')
         |WHERE rn = 1 AND NOT (repo < 'repo_00008')
         |  AND NOT (repo >= 'repo_00030' AND repo < 'repo_00035')""".stripMargin,

    "q_sql_merge_mirror" ->
      s"""SELECT repo, path, "commit", lsn, lang, sha256(content) AS content_sha
         |FROM (SELECT *, row_number() OVER (PARTITION BY repo, path
         |                                   ORDER BY "commit" DESC, lsn DESC) rn
         |      FROM read_parquet('$ExportRoot/q_sql_merge_mirror/input/*.parquet')
         |      WHERE op <> 'D' AND lsn >= 4000)
         |WHERE rn = 1""".stripMargin,

    "q_sql_insert" ->
      s"""SELECT repo, path, "commit", lsn, lang, sha256(content) AS content_sha
         |FROM (SELECT *, row_number() OVER (PARTITION BY repo, path
         |                                   ORDER BY "commit" DESC, lsn DESC) rn
         |      FROM read_parquet('$ExportRoot/q_sql_insert/input/*.parquet')
         |      WHERE op <> 'D')
         |WHERE rn = 1""".stripMargin,

    "q_sql_changes" ->
      s"""SELECT repo, path, "commit", lsn, lang, sha256(content) AS content_sha
         |FROM (SELECT *, row_number() OVER (PARTITION BY repo, path
         |                                   ORDER BY "commit" DESC, lsn DESC) rn
         |      FROM read_parquet('$ExportRoot/q_sql_changes/events/*.parquet')
         |      WHERE lsn >= 3000 AND lsn < 6000)
         |WHERE rn = 1 AND op <> 'D'""".stripMargin,

    // the overwrite replaced everything: final state = LWW winners of the
    // overwrite source alone (lsn >= 4000, non-tombstone rows)
    "q_sql_overwrite" ->
      s"""SELECT repo, path, "commit", lsn, lang, sha256(content) AS content_sha
         |FROM (SELECT *, row_number() OVER (PARTITION BY repo, path
         |                                   ORDER BY "commit" DESC, lsn DESC) rn
         |      FROM read_parquet('$ExportRoot/q_sql_overwrite/input/*.parquet')
         |      WHERE op <> 'D' AND lsn >= 4000)
         |WHERE rn = 1""".stripMargin,

    // the materialized detour is invisible: the view equals the aggregate
    // recomputed directly over the LWW winners of the whole input
    "q_sql_mart" ->
      s"""SELECT lang, count(*) AS n_rows, max(lsn) AS max_lsn, min(lsn) AS min_lsn
         |FROM (SELECT *, row_number() OVER (PARTITION BY repo, path
         |                                   ORDER BY "commit" DESC, lsn DESC) rn
         |      FROM read_parquet('$ExportRoot/q_sql_mart/input/*.parquet'))
         |WHERE rn = 1 AND op <> 'D'
         |GROUP BY lang""".stripMargin,

    // the WAP detour is semantically free: final state = LWW winners over
    // the whole input (both slices), live rows only
    "q_wap" ->
      s"""SELECT repo, path, "commit", lsn, lang, sha256(content) AS content_sha
         |FROM (SELECT *, row_number() OVER (PARTITION BY repo, path
         |                                   ORDER BY "commit" DESC, lsn DESC) rn
         |      FROM read_parquet('$ExportRoot/q_wap/input/*.parquet'))
         |WHERE rn = 1 AND op <> 'D'""".stripMargin,

    // the zero-copy import is indistinguishable from ingest: final state =
    // LWW winners over the whole input (both slices), live rows only
    "q_add_files" ->
      s"""SELECT repo, path, "commit", lsn, lang, sha256(content) AS content_sha
         |FROM (SELECT *, row_number() OVER (PARTITION BY repo, path
         |                                   ORDER BY "commit" DESC, lsn DESC) rn
         |      FROM read_parquet('$ExportRoot/q_add_files/input/*.parquet'))
         |WHERE rn = 1 AND op <> 'D'""".stripMargin,

    // full-envelope state: per-key LWW winner INCLUDING winning tombstones
    "q_sql_cdc" ->
      s"""SELECT repo, path, "commit", lsn, op, lang,
         |       sha256(content) AS content_sha
         |FROM (SELECT *, row_number() OVER (PARTITION BY repo, path
         |                                   ORDER BY "commit" DESC, lsn DESC) rn
         |      FROM read_parquet('$ExportRoot/q_sql_cdc/input/*.parquet'))
         |WHERE rn = 1""".stripMargin,

    "q_schema_evolution" -> lwwOracle(
      s"$ExportRoot/q_schema_evolution/*.parquet",
      "lang AS language, count(*) AS n_rows, max(lsn) AS max_lsn",
      tail = "\nGROUP BY lang"),

    "q_bucket_evolution" -> lwwOracle(
      s"$ExportRoot/q_bucket_evolution/*.parquet",
      """repo, path, "commit", lsn, lang, sha256(content) AS content_sha"""),

    "q_point_lookup" -> lwwOracle(
      s"$ExportRoot/q_point_lookup/*.parquet",
      """repo, path, "commit", lsn, lang, sha256(content) AS content_sha""",
      tail = " AND repo = 'repo_00007'"),

    "q_point_lookup_multi" -> lwwOracle(
      s"$ExportRoot/q_point_lookup_multi/events/*.parquet",
      """repo, path, "commit", lsn, lang, sha256(content) AS content_sha""",
      tail = " AND repo IN ('repo_00007', 'repo_00013', 'repo_00031')"),

    "q_mart_streaming" -> lwwOracle(
      s"$ExportRoot/q_mart_streaming/binlog/segment-*.parquet",
      "lang, count(*) AS n_files, max(lsn) AS max_lsn",
      tail = "\nGROUP BY lang"),

    "q_mart_incremental" ->
      s"""WITH ev AS (SELECT * FROM read_parquet('$ExportRoot/q_mart_incremental/*.parquet')),
         |new_state AS (
         |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY repo, path
         |                                              ORDER BY "commit" DESC, lsn DESC) rn
         |                 FROM ev) WHERE rn = 1 AND op <> 'D'),
         |old_state AS (
         |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY repo, path
         |                                              ORDER BY "commit" DESC, lsn DESC) rn
         |                 FROM ev WHERE lsn < 3000) WHERE rn = 1 AND op <> 'D'),
         |changed AS (SELECT DISTINCT repo, path FROM ev WHERE lsn >= 3000),
         |affected AS (
         |  SELECT DISTINCT o.lang FROM old_state o JOIN changed c USING (repo, path)
         |  UNION
         |  SELECT DISTINCT n.lang FROM new_state n JOIN changed c USING (repo, path))
         |SELECT s.lang, count(*) AS n_files,
         |       CAST(CASE WHEN s.lang IN (SELECT lang FROM affected) THEN 1 ELSE 0 END AS BIGINT) AS publish_epoch
         |FROM new_state s GROUP BY s.lang""".stripMargin
  )
}
