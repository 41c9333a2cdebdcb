package graft.exprs

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PivotAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("pivot_sum builds a client→sum map per group (the JS pivot-UDF analog)") {
    PivotSumAggregator.register(spark)
    val df = Seq(
      ("app1", "desktop", 10L), ("app1", "mobile", 5L), ("app1", "desktop", 7L),
      ("app2", "mobile", 3L)
    ).toDF("app", "client", "origins")
    val out = df.groupBy($"app")
      .agg(expr("pivot_sum(client, origins)").as("by_client"))
      .as[(String, Map[String, Long])].collect().toMap
    assert(out("app1") == Map("desktop" -> 17L, "mobile" -> 5L))
    assert(out("app2") == Map("mobile" -> 3L))
  }

  test("typed usage over a KeyValueGroupedDataset") {
    val agg = new PivotSumAggregator().toColumn
    val ds = Seq(("u1", ("click", 1L)), ("u1", ("buy", 2L)), ("u2", ("click", 4L)))
      .toDS()
    val out = ds.groupByKey(_._1).mapValues(_._2).agg(agg.name("m"))
      .collect().toMap
    assert(out("u1") == Map("click" -> 1L, "buy" -> 2L))
    assert(out("u2") == Map("click" -> 4L))
  }
}
