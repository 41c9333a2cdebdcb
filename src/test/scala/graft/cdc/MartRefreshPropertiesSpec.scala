package graft.cdc

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.lake.LakeTable

/** Property: for ARBITRARY event sets, an ARBITRARY split into two merge
  * epochs, and a NULL-bearing group column, the changelog-driven
  * incremental mart refresh must produce document-for-document the same
  * mart as a from-scratch rebuild over the final state — including groups
  * that vanished (tombstoned, not stale) and groups keys moved between.
  * Few iterations by design: each evaluation builds two lake tables and
  * two marts on disk. */
class MartRefreshPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val genEvent: Gen[ChangeEvent] = for {
    repo <- Gen.oneOf("r1", "r2", "r3")
    path <- Gen.oneOf("a", "b", "c")
    commit <- Gen.chooseNum(0, 5).map(n => f"c$n%03d")
    lsn <- Gen.chooseNum(0L, 1000000L)
    op <- Gen.frequency(6 -> "U", 2 -> "I", 2 -> "D")
    lang <- Gen.oneOf(null: String, "scala", "go")
    content <- Gen.alphaStr.map(s => if (op == "D") null else s.take(10))
  } yield ChangeEvent(repo, path, commit, lsn, op, lang, content)

  private val genCase: Gen[(List[ChangeEvent], Int)] = for {
    n <- Gen.chooseNum(4, 24)
    evs <- Gen.listOfN(n, genEvent)
    dedup = evs.groupBy(e => (e.repo, e.path, e.commit, e.lsn)).values.map(_.head).toList
    if dedup.size >= 2
    split <- Gen.chooseNum(1, dedup.size - 1)
  } yield (dedup, split)

  private def docsOf(mart: LakeTable, q: String): Map[String, String] =
    Mart.readDocs(mart, q).select($"doc_key", $"doc_json")
      .as[(String, String)].collect().toMap

  test("incremental refresh == full rebuild for arbitrary events, split points and null groups") {
    val agg = (state: org.apache.spark.sql.DataFrame) =>
      state.groupBy($"lang").agg(count(lit(1)).as("n_files"), max($"lsn").as("max_lsn"))
    var iter = 0
    val prop = Prop.forAll(genCase) { case (events, split) =>
      iter += 1
      val dir = tmpDir(s"mart-prop-$iter")
      val (b1, b2) = events.splitAt(split)
      val table = LakeTable.create(spark, s"$dir/table", CdcStream.binlogSchema, numBuckets = 2)
      LakeMerge.mergeBatch(table, b1.toDF(), Some(("ing", 0L)))
      val mart = Mart.martTable(spark, s"$dir/mart")
      Mart.publish(mart, agg(LakeMerge.readState(table)), Seq("lang"), "q", 0L)
      val v0 = table.currentVersion
      LakeMerge.mergeBatch(table, b2.toDF(), Some(("ing", 1L)))
      Mart.refreshIncremental(mart, table, v0, table.currentVersion,
        Seq("lang"), agg, "q", epoch = 1L)

      val rebuilt = Mart.martTable(spark, s"$dir/rebuild")
      Mart.publish(rebuilt, agg(LakeMerge.readState(table)), Seq("lang"), "q", 1L)

      val inc = docsOf(mart, "q")
      val full = docsOf(rebuilt, "q")
      if (inc != full) {
        System.err.println(s"MISMATCH events=$events split=$split\ninc=$inc\nfull=$full")
      }
      inc == full
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }
}
