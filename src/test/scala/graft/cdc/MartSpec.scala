package graft.cdc

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.LakeTable

class MartSpec extends SparkSpec {
  import spark.implicits._

  private def setupState(dir: String): LakeTable = {
    val table = LakeTable.create(spark, s"$dir/table", CdcStream.binlogSchema, numBuckets = 4)
    LakeMerge.mergeBatch(table,
      EventGen.events(spark, 4000L, nRepos = 30, pathsPerRepo = 5, langFromLsn = 0L),
      Some(("ingest", 0L)))
    table
  }

  test("publish: hash-keyed idempotent docs; re-publish same epoch fenced; newer epoch wins") {
    val dir = tmpDir("mart")
    val table = setupState(dir)
    val mart = Mart.martTable(spark, s"$dir/mart")

    def report = LakeMerge.readState(table)
      .groupBy($"lang").agg(count(lit(1)).as("n_files"))

    val s1 = Mart.publish(mart, report, Seq("lang"), "adoption", 1L)
    assert(s1.applied)
    val docs1 = Mart.readDocs(mart, "adoption").collect()
    assert(docs1.length == report.count())
    assert(docs1.forall(_.getAs[String]("doc_key").length == 64)) // sha256 hex
    assert(docs1.forall(_.getAs[String]("doc_json").contains("n_files")))

    // same epoch re-publish → fenced no-op
    val s2 = Mart.publish(mart, report, Seq("lang"), "adoption", 1L)
    assert(!s2.applied)

    // state changes → newer publish epoch wins per doc
    LakeMerge.mergeBatch(table,
      EventGen.eventsRange(spark, 4000L, 6000L, nRepos = 30, pathsPerRepo = 5, langFromLsn = 0L),
      Some(("ingest", 1L)))
    Mart.publish(mart, report, Seq("lang"), "adoption", 2L)
    val docs2 = Mart.readDocs(mart, "adoption").collect()
    assert(docs2.length == report.count())
    assert(docs2.forall(_.getAs[Long]("publish_epoch") == 2L),
      "every doc must carry the latest publish epoch")
    // still one doc per key (upsert, not append)
    assert(docs2.map(_.getAs[String]("doc_key")).distinct.length == docs2.length)
  }

  test("pinned cross-table read: stable and internally consistent under concurrent ingest") {
    val dir = tmpDir("mart-pin")
    val table = setupState(dir)
    val mart = Mart.martTable(spark, s"$dir/mart")
    def agg(state: org.apache.spark.sql.DataFrame) =
      state.groupBy($"lang").agg(count(lit(1)).as("n_files"))

    assert(Mart.catchUp(mart, table, Seq("lang"), agg, "bylang").isDefined)
    val pinned = Mart.pin(mart, "bylang")
    assert(pinned.sourceVersion == table.currentVersion)

    def docsAt = Mart.readDocsAt(mart, "bylang", pinned)
      .select("doc_key", "doc_json").collect().map(_.toSeq).toSet
    def srcAggAt = agg(Mart.readSourceAt(table, pinned))
      .collect().map(_.toSeq).toSet
    val docsBefore = docsAt
    val srcBefore = srcAggAt

    // CONCURRENT ingest: both tables advance several commits
    LakeMerge.mergeBatch(table,
      EventGen.eventsRange(spark, 4000L, 6000L, nRepos = 30, pathsPerRepo = 5,
        langFromLsn = 0L), Some(("ingest", 1L)))
    assert(Mart.catchUp(mart, table, Seq("lang"), agg, "bylang").isDefined)
    LakeMerge.mergeBatch(table,
      EventGen.eventsRange(spark, 6000L, 7000L, nRepos = 30, pathsPerRepo = 5,
        langFromLsn = 0L), Some(("ingest", 2L)))

    // the pinned read is STABLE: identical rows on both tables
    assert(docsAt == docsBefore, "pinned mart read must not move under ingest")
    assert(srcAggAt == srcBefore, "pinned source read must not move under ingest")
    // ... and INTERNALLY CONSISTENT: the pinned docs are exactly the
    // aggregate of the pinned source state (never a newer mart against an
    // older source or vice versa)
    val docPairs = Mart.readDocsAt(mart, "bylang", pinned)
      .select(get_json_object($"doc_json", "$.lang").as("lang"),
        get_json_object($"doc_json", "$.n_files").cast("long").as("n_files"))
      .collect().map(r => (Option(r.getString(0)).getOrElse(""), r.getLong(1))).toSet
    val srcPairs = agg(Mart.readSourceAt(table, pinned))
      .collect().map(r => (Option(r.getString(0)).getOrElse(""), r.getLong(1))).toSet
    assert(docPairs == srcPairs,
      "pinned docs must equal the aggregate over the pinned source version")

    // a FRESH pin reflects the newer refresh (and its newer source version)
    val pinned2 = Mart.pin(mart, "bylang")
    assert(pinned2.martVersion > pinned.martVersion)
    assert(pinned2.sourceVersion > pinned.sourceVersion)
    // pinning an unknown query fails loudly
    intercept[IllegalStateException] { Mart.pin(mart, "nope") }
  }

  test("two queries coexist in one mart; deleteDocs tombstones one query's docs only") {
    val dir = tmpDir("mart2")
    val table = setupState(dir)
    val mart = Mart.martTable(spark, s"$dir/mart")
    val byLang = LakeMerge.readState(table).groupBy($"lang").agg(count(lit(1)).as("n"))
    val byRepo = LakeMerge.readState(table).groupBy($"repo").agg(count(lit(1)).as("n"))

    Mart.publish(mart, byLang, Seq("lang"), "by-lang", 1L)
    Mart.publish(mart, byRepo, Seq("repo"), "by-repo", 1L)
    assert(Mart.readDocs(mart, "by-lang").count() == byLang.count())
    assert(Mart.readDocs(mart, "by-repo").count() == byRepo.count())

    Mart.deleteDocs(mart, "by-lang", 2L)
    assert(Mart.readDocs(mart, "by-lang").count() == 0)
    assert(Mart.readDocs(mart, "by-repo").count() == byRepo.count())
  }

  test("a mart written under a different epoch encoding fails loudly at open") {
    val dir = tmpDir("martenc")
    // simulate a pre-v2 mart: a lake table at the mart root WITHOUT the
    // mart.encoding property (what round-2 marts look like on disk)
    LakeTable.create(spark, s"$dir/mart", CdcStream.binlogSchema, numBuckets = 4)
    val ex = intercept[IllegalArgumentException](Mart.martTable(spark, s"$dir/mart"))
    assert(ex.getMessage.contains("encoding"))
    // a mart created through martTable round-trips fine
    val ok = Mart.martTable(spark, s"$dir/mart2")
    assert(Mart.martTable(spark, s"$dir/mart2").snapshot
      .properties("mart.encoding") == Mart.EncodingVersion)
    assert(ok.root == s"$dir/mart2")
  }

  test("SQL-as-source: registered live view queries via spark.sql match the DataFrame path") {
    val dir = tmpDir("martsql")
    val table = setupState(dir)
    LakeMerge.registerView(table, "repo_state")
    val viaSql = spark.sql(
      "SELECT lang, count(*) AS n FROM repo_state GROUP BY lang ORDER BY lang")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaDf = LakeMerge.readState(table)
      .groupBy($"lang").agg(count(lit(1)).as("n")).orderBy($"lang")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql == viaDf && viaSql.nonEmpty)
  }

  test("incremental refresh: only affected groups republished, vanished group tombstoned, result equals full rebuild") {
    val dir = tmpDir("mart-incr")
    val table = setupState(dir)
    val mart = Mart.martTable(spark, s"$dir/mart")
    val agg = (state: org.apache.spark.sql.DataFrame) =>
      state.groupBy($"repo").agg(count(lit(1)).as("n_paths"), max($"lsn").as("max_lsn"))

    Mart.publish(mart, agg(LakeMerge.readState(table)), Seq("repo"), "byrepo", 0L)
    val v0 = table.currentVersion
    val docs0 = Mart.readDocs(mart, "byrepo").collect()
      .map(r => r.getAs[String]("doc_key") -> r.getAs[Long]("publish_epoch")).toMap

    // the change batch touches exactly TWO repos: one path updated in
    // repo_00001; EVERY live path of repo_00002 tombstoned (group vanishes)
    val doomed = LakeMerge.readState(table).where($"repo" === "repo_00002")
      .select($"path").as[String].collect().toSeq
    assert(doomed.nonEmpty, "fixture: repo_00002 must have live paths")
    val upd = Seq(("repo_00001", "src/00/file_0000.scala", "c999999999999", 999999L, "U", "scala", "new content"))
    val dels = doomed.map(p => ("repo_00002", p, "c999999999999", 999998L - doomed.indexOf(p), "D", null: String, null: String))
    LakeMerge.mergeBatch(table,
      (upd ++ dels).toDF("repo", "path", "commit", "lsn", "op", "lang", "content"),
      Some(("ingest", 9L)))

    Mart.refreshIncremental(mart, table, v0, table.currentVersion,
      Seq("repo"), agg, "byrepo", epoch = 1L)
    val docs1 = Mart.readDocs(mart, "byrepo").collect()
      .map(r => (r.getAs[String]("doc_key"),
        (r.getAs[String]("doc_json"), r.getAs[Long]("publish_epoch")))).toMap

    // equality with a from-scratch rebuild over the final state
    val rebuilt = Mart.martTable(spark, s"$dir/mart-rebuild")
    Mart.publish(rebuilt, agg(LakeMerge.readState(table)), Seq("repo"), "byrepo", 1L)
    val full = Mart.readDocs(rebuilt, "byrepo").collect()
      .map(r => r.getAs[String]("doc_key") -> r.getAs[String]("doc_json")).toMap
    assert(docs1.view.mapValues(_._1).toMap == full,
      "incremental refresh diverged from full rebuild")

    // incrementality: exactly one doc republished at epoch 1 (repo_00001);
    // every other surviving doc kept its epoch-0 publish
    val republished = docs1.filter(_._2._2 == 1L).keySet
    assert(republished.size == 1, s"expected 1 refreshed doc, got ${republished.size}")
    assert(docs1.filter(_._2._2 == 0L).keySet.subsetOf(docs0.keySet))
    // the vanished group's doc is gone (tombstoned, not stale)
    assert(docs1.size == docs0.size - 1)
  }

  test("catchUp: full publish first, incremental after, no-op when current, re-baseline across rollback") {
    val dir = tmpDir("mart-catchup")
    val table = LakeTable.create(spark, s"$dir/table", CdcStream.binlogSchema, numBuckets = 4)
    val mart = Mart.martTable(spark, s"$dir/mart")
    val agg = (state: org.apache.spark.sql.DataFrame) =>
      state.groupBy($"lang").agg(count(lit(1)).as("n_files"))
    def expect: Map[Option[String], Long] = agg(LakeMerge.readState(table)).collect()
      .map(r => Option(r.getAs[String]("lang")) -> r.getAs[Long]("n_files")).toMap
    def got: Map[Option[String], Long] = Mart.readDocs(mart, "bylang").collect().map { r =>
      val j = r.getAs[String]("doc_json")
      ("\"lang\":\"([a-z]+)\"".r.findFirstMatchIn(j).map(_.group(1)),
        "\"n_files\":([0-9]+)".r.findFirstMatchIn(j).get.group(1).toLong)
    }.toMap

    // 1. first catch-up = full publish. (Base table must be big enough in
    // BYTES that a 10-row batch's parquet file-overhead floor (~8 KB) sits
    // below the cost gate's changed-fraction threshold — and the write path
    // dedups to winners, so bytes scale with KEY CARDINALITY, not events.)
    LakeMerge.mergeBatch(table,
      EventGen.events(spark, 20000L, nRepos = 200, pathsPerRepo = 10, langFromLsn = 0L),
      Some(("ing", 0L)))
    assert(Mart.catchUp(mart, table, Seq("lang"), agg, "bylang").isDefined)
    assert(got == expect)
    // 2. already current → None
    assert(Mart.catchUp(mart, table, Seq("lang"), agg, "bylang").isEmpty)
    // 3. a SMALL targeted batch (new keys, all lang 'scala') → the cost
    // model picks the INCREMENTAL path and only the scala group is
    // republished; every other group's doc keeps its earlier epoch
    val epochsBefore = Mart.readDocs(mart, "bylang")
      .select($"publish_epoch").as[Long].collect().toSet
    LakeMerge.mergeBatch(table,
      (0 until 10).map(i => (s"small_$i", "p", "c999999999990", 900000L + i, "U", "scala", s"tiny $i"))
        .toDF("repo", "path", "commit", "lsn", "op", "lang", "content"),
      Some(("ing", 1L)))
    assert(Mart.catchUp(mart, table, Seq("lang"), agg, "bylang").isDefined)
    assert(got == expect)
    val epochsAfter = Mart.readDocs(mart, "bylang").collect().map { r =>
      ("\"lang\":\"([a-z]+)\"".r.findFirstMatchIn(r.getAs[String]("doc_json")).map(_.group(1)),
        r.getAs[Long]("publish_epoch"))
    }.toMap
    val scalaEpoch = epochsAfter(Some("scala"))
    assert(!epochsBefore.contains(scalaEpoch), "scala group must have been republished")
    assert(epochsAfter.exists { case (l, e) => l != Some("scala") && epochsBefore.contains(e) },
      "a bystander group's doc was republished — incremental path not taken")
    val vBeforePy = table.currentVersion

    // 4. a group appears, is caught up, then the source ROLLS it back:
    // catch-up must re-baseline and the stale group's doc must vanish
    LakeMerge.mergeBatch(table,
      Seq(("pyrepo", "p", "c999999999999", 999999L, "U", "zz", "sentinel!"))
        .toDF("repo", "path", "commit", "lsn", "op", "lang", "content"),
      Some(("ing", 2L)))
    assert(Mart.catchUp(mart, table, Seq("lang"), agg, "bylang").isDefined)
    assert(got.contains(Some("zz")))
    table.rollback(vBeforePy)
    assert(Mart.catchUp(mart, table, Seq("lang"), agg, "bylang").isDefined,
      "rollback must trigger a re-baseline, not a no-op")
    assert(!got.contains(Some("zz")), "stale group doc survived the re-baseline")
    assert(got == expect)
    // and it is current again afterwards
    assert(Mart.catchUp(mart, table, Seq("lang"), agg, "bylang").isEmpty)
  }

  test("incremental refresh handles a NULL group value (null-safe group joins)") {
    val dir = tmpDir("mart-nullgrp")
    val table = LakeTable.create(spark, s"$dir/table", CdcStream.binlogSchema, numBuckets = 4)
    // NULL is a real group in this mart: plant two keys whose winners have
    // lang IS NULL alongside the generated non-null population
    LakeMerge.mergeBatch(table,
      EventGen.events(spark, 4000L, nRepos = 30, pathsPerRepo = 5, langFromLsn = 0L)
        .unionByName(Seq(
          ("repo_nl", "a.txt", "c999999999990", 899990L, "U", null: String, "no lang a"),
          ("repo_nl", "b.txt", "c999999999990", 899991L, "U", null: String, "no lang b"))
          .toDF("repo", "path", "commit", "lsn", "op", "lang", "content")),
      Some(("ingest", 0L)))
    val mart = Mart.martTable(spark, s"$dir/mart")
    val agg = (state: org.apache.spark.sql.DataFrame) =>
      state.groupBy($"lang").agg(count(lit(1)).as("n_files"))
    Mart.publish(mart, agg(LakeMerge.readState(table)), Seq("lang"), "bylang", 0L)
    val v0 = table.currentVersion

    // change a key whose winner stays in the NULL-lang group
    val victim = LakeMerge.readState(table).where($"lang".isNull)
      .select($"repo", $"path").limit(1).as[(String, String)].collect().head
    LakeMerge.mergeBatch(table,
      Seq((victim._1, victim._2, "c999999999999", 999999L, "U", null: String, "still-null-lang"))
        .toDF("repo", "path", "commit", "lsn", "op", "lang", "content"),
      Some(("ingest", 9L)))

    Mart.refreshIncremental(mart, table, v0, table.currentVersion,
      Seq("lang"), agg, "bylang", epoch = 1L)

    val expect = agg(LakeMerge.readState(table)).collect()
      .map(r => Option(r.getAs[String]("lang")) -> r.getAs[Long]("n_files")).toMap
    val got = Mart.readDocs(mart, "bylang").collect().map { r =>
      val j = r.getAs[String]("doc_json")
      val lang = "\"lang\":\"([a-z]+)\"".r.findFirstMatchIn(j).map(_.group(1))
      val n = "\"n_files\":([0-9]+)".r.findFirstMatchIn(j).get.group(1).toLong
      (lang, (n, r.getAs[Long]("publish_epoch")))
    }.toMap
    // the null-group doc must SURVIVE, be refreshed (it was affected), and
    // carry the correct count — under plain equi-joins it was excluded from
    // the recompute and tombstoned as "vanished"
    assert(got.contains(None), s"null-lang doc was lost: ${got.keySet}")
    assert(got(None)._1 == expect(None), "null-lang count wrong after refresh")
    assert(got(None)._2 == 1L, "null-lang doc should have been republished")
    assert(got.view.mapValues(_._1).toMap == expect)
  }

  test("incremental refresh recomputes the group a key MOVED OUT of") {
    val dir = tmpDir("mart-move")
    val table = setupState(dir)
    val mart = Mart.martTable(spark, s"$dir/mart")
    val agg = (state: org.apache.spark.sql.DataFrame) =>
      state.groupBy($"lang").agg(count(lit(1)).as("n_files"))

    Mart.publish(mart, agg(LakeMerge.readState(table)), Seq("lang"), "bylang", 0L)
    val v0 = table.currentVersion
    // move ONE key from its current lang to another
    val victim = LakeMerge.readState(table).where($"lang" === "scala")
      .select($"repo", $"path").limit(1).as[(String, String)].collect().head
    LakeMerge.mergeBatch(table,
      Seq((victim._1, victim._2, "c999999999999", 999999L, "U", "go", "moved"))
        .toDF("repo", "path", "commit", "lsn", "op", "lang", "content"),
      Some(("ingest", 9L)))

    Mart.refreshIncremental(mart, table, v0, table.currentVersion,
      Seq("lang"), agg, "bylang", epoch = 1L)

    val expect = agg(LakeMerge.readState(table)).collect()
      .map(r => Option(r.getAs[String]("lang")) -> r.getAs[Long]("n_files")).toMap
    val got = Mart.readDocs(mart, "bylang").collect().map { r =>
      val j = r.getAs[String]("doc_json")
      val lang = "\"lang\":\"([a-z]+)\"".r.findFirstMatchIn(j).map(_.group(1))
      val n = "\"n_files\":([0-9]+)".r.findFirstMatchIn(j).get.group(1).toLong
      (lang, (n, r.getAs[Long]("publish_epoch")))
    }.toMap
    assert(got.view.mapValues(_._1).toMap == expect,
      "doc contents diverged from the true aggregate after a group move")
    // BOTH sides of the move were refreshed: the shrunk source group and
    // the grown target group carry the new epoch; bystanders keep epoch 0
    assert(got(Some("scala"))._2 == 1L && got(Some("go"))._2 == 1L)
    assert(got.exists(_._2._2 == 0L), "some group should be untouched")
  }
}
