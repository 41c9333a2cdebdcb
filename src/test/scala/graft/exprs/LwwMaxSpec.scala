package graft.exprs

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LwwMaxSpec extends SparkSpec {
  import spark.implicits._

  test("lww_max picks the value with the greatest ordering key (hash agg path)") {
    val df = Seq(
      ("k1", "c001", 1L, "v1"),
      ("k1", "c002", 9L, "v2"),
      ("k1", "c002", 3L, "v-mid"),
      ("k2", "c009", 1L, "w1")
    ).toDF("k", "commit", "lsn", "v")
    val out = df.groupBy($"k")
      .agg(LwwMax.lww_max(struct($"v", $"lsn"), struct($"commit", $"lsn")).as("w"))
      .select($"k", $"w.v", $"w.lsn")
      .as[(String, String, Long)].collect().toMap2
    assert(out("k1") == ("v2", 9L))
    assert(out("k2") == ("w1", 1L))
  }

  test("lww_max agrees with max_by on generated CDC events") {
    val events = graft.cdc.EventGen.events(spark, 5000L, nRepos = 40, pathsPerRepo = 6)
    val viaLww = events.groupBy($"repo", $"path")
      .agg(LwwMax.lww_max(struct($"content"), struct($"commit", $"lsn")).as("w"))
      .select($"repo", $"path", sha2($"w.content", 256))
      .as[(String, String, String)].collect().toSet
    val viaMaxBy = events.groupBy($"repo", $"path")
      .agg(max_by(struct($"content"), struct($"commit", $"lsn")).as("w"))
      .select($"repo", $"path", sha2($"w.content", 256))
      .as[(String, String, String)].collect().toSet
    assert(viaLww == viaMaxBy)
  }

  test("lww_max over all-null ordering yields null value") {
    val df = Seq(("k1", null: String, null: String)).toDF("k", "commit", "v")
    val out = df.groupBy($"k")
      .agg(LwwMax.lww_max($"v", $"commit").as("w")).collect()(0)
    assert(out.get(1) == null)
  }

  implicit class TupleMap(xs: Array[(String, String, Long)]) {
    def toMap2: Map[String, (String, Long)] = xs.map(t => t._1 -> (t._2, t._3)).toMap
  }
}
