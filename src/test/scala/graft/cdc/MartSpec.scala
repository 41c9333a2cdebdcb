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
}
