package graft.cdc

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MergeEngineSpec extends SparkSpec {
  import spark.implicits._

  private def collectState(df: org.apache.spark.sql.DataFrame): Map[(String, String), (String, Long, String)] =
    df.select("repo", "path", "commit", "lsn", "content").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getString(2), r.getLong(3), r.getString(4)))
      .toMap

  test("batch LWW dedup picks the max (commit, lsn) winner per key") {
    val batch = Seq(
      ChangeEvent("r1", "a", "c001", 1L, "I", null, "v1"),
      ChangeEvent("r1", "a", "c002", 5L, "U", null, "v2"),
      ChangeEvent("r1", "a", "c002", 3L, "U", null, "v-late"),
      ChangeEvent("r2", "b", "c001", 2L, "I", null, "w1")
    ).toDF()
    val out = collectState(MergeEngine.dedupBatch(batch))
    assert(out(("r1", "a")) == ("c002", 5L, "v2"))
    assert(out(("r2", "b")) == ("c001", 2L, "w1"))
  }

  test("apply: upsert, delete, and late-event-loses semantics") {
    val state = Seq(
      ("r1", "a", "c005", 50L, "U", null: String, "cur-a"),
      ("r1", "b", "c005", 51L, "U", null: String, "cur-b"),
      ("r2", "c", "c005", 52L, "U", null: String, "cur-c")
    ).toDF("repo", "path", "commit", "lsn", "op", "lang", "content")
    val batch = Seq(
      ChangeEvent("r1", "a", "c006", 60L, "U", null, "new-a"), // newer → wins
      ChangeEvent("r1", "b", "c004", 40L, "U", null, "old-b"), // late → loses
      ChangeEvent("r2", "c", "c006", 61L, "D", null, null),    // tombstone → gone
      ChangeEvent("r3", "d", "c006", 62L, "I", null, "new-d")  // insert
    ).toDF()
    val out = collectState(MergeEngine.liveView(MergeEngine.apply(state, batch)))
    assert(out.keySet == Set(("r1", "a"), ("r1", "b"), ("r3", "d")))
    assert(out(("r1", "a"))._3 == "new-a")
    assert(out(("r1", "b"))._3 == "cur-b")
    assert(out(("r3", "d"))._3 == "new-d")
  }

  test("10k-event replay in 5 batches sha256-matches the sequential fold oracle") {
    val n = 10000L
    val all = EventGen.events(spark, n, nRepos = 120, pathsPerRepo = 12,
      langFromLsn = 6000L).cache()
    assert(all.count() == n)

    // distributed: 5 consecutive batches folded through MergeEngine.apply
    var state = all.where(lit(false)) // empty tombstone-retaining state
    (0 until 5).foreach { b =>
      val batch = all.where(col("lsn") >= b * 2000L && col("lsn") < (b + 1) * 2000L)
      state = MergeEngine.apply(state, batch)
    }
    val got = MergeEngine.liveView(state)
      .select($"repo", $"path", sha2(col("content"), 256).as("h"))
      .as[(String, String, String)].collect().toMap2

    // oracle: plain Scala fold on the driver
    val events = all.orderBy("lsn").as[ChangeEvent].collect().toSeq
    val oracle = MergeEngine.foldOracle(events).map { case (k, e) =>
      k -> org.apache.commons.codec.digest.DigestUtils.sha256Hex(e.content)
    }
    assert(got.size == oracle.size)
    assert(got == oracle)
    all.unpersist()
  }

  test("replay is idempotent: re-applying the last batch changes nothing") {
    val all = EventGen.events(spark, 3000L, nRepos = 50, pathsPerRepo = 8).cache()
    val b1 = all.where(col("lsn") < 2000L)
    val b2 = all.where(col("lsn") >= 2000L)
    val s1 = MergeEngine.apply(MergeEngine.apply(all.where(lit(false)), b1), b2)
    val s2 = MergeEngine.apply(s1, b2) // duplicate redelivery
    val h1 = MergeEngine.liveView(s1).select($"repo", $"path", sha2($"content", 256)).as[(String, String, String)].collect().toSet
    val h2 = MergeEngine.liveView(s2).select($"repo", $"path", sha2($"content", 256)).as[(String, String, String)].collect().toSet
    assert(h1 == h2)
    all.unpersist()
  }

  test("batch-split commutativity: different batch boundaries converge") {
    val all = EventGen.events(spark, 4000L, nRepos = 40, pathsPerRepo = 6).cache()
    def replay(bounds: Seq[Long]): Set[(String, String, String)] = {
      var state = all.where(lit(false))
      bounds.sliding(2).foreach { case Seq(lo, hi) =>
        state = MergeEngine.apply(state, all.where(col("lsn") >= lo && col("lsn") < hi))
      }
      MergeEngine.liveView(state)
        .select($"repo", $"path", sha2($"content", 256)).as[(String, String, String)].collect().toSet
    }
    assert(replay(Seq(0L, 2000L, 4000L)) == replay(Seq(0L, 500L, 3100L, 4000L)))
    // OUT-OF-ORDER batches (delete before older upsert) must also converge:
    // tombstone retention prevents resurrection
    assert(replay(Seq(0L, 2000L, 4000L)) == {
      var state = all.where(lit(false))
      state = MergeEngine.apply(state, all.where(col("lsn") >= 2000L)) // newer first
      state = MergeEngine.apply(state, all.where(col("lsn") < 2000L))  // older later
      MergeEngine.liveView(state)
        .select($"repo", $"path", sha2($"content", 256)).as[(String, String, String)].collect().toSet
    })
    all.unpersist()
  }

  test("readRepo point lookup prunes to one bucket and matches the full state") {
    val dir = java.nio.file.Files.createTempDirectory("readrepo").toString
    val table = graft.lake.LakeTable.create(spark, s"$dir/table",
      CdcStream.binlogSchema, numBuckets = 16)
    LakeMerge.mergeBatch(table,
      EventGen.events(spark, 5000L, nRepos = 40, pathsPerRepo = 6), Some(("pl", 0L)))
    val full = LakeMerge.readState(table).where($"repo" === "repo_00003")
      .select($"path", sha2($"content", 256)).as[(String, String)].collect().toSet
    val point = LakeMerge.readRepo(table, "repo_00003")
      .select($"path", sha2($"content", 256)).as[(String, String)].collect().toSet
    assert(point == full)
    assert(point.nonEmpty)
  }

  implicit class TupleMap(xs: Array[(String, String, String)]) {
    def toMap2: Map[(String, String), String] = xs.map(t => (t._1, t._2) -> t._3).toMap
  }
}
