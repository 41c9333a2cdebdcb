package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-regression gate: the physical shapes the 100-TB posture depends on
  * (exchange counts, broadcast joins, scan-level column pruning) asserted
  * against the actual executed plans, so a future refactor cannot silently
  * add a shuffle or demote a broadcast join without failing here. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executed(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    // unwrap AQE wrappers so counts see the real operators
    def children(n: SparkPlan): Seq[SparkPlan] = n match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other => other.children ++ other.subqueries
    }
    def walk(n: SparkPlan): Seq[T] =
      (if (pf.isDefinedAt(n)) Seq(pf(n)) else Nil) ++ children(n).flatMap(walk)
    walk(p)
  }

  private def shuffles(df: DataFrame): Int =
    collectAll(executed(df)) { case e: ShuffleExchangeExec => e }.size

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  test("windowed rates: exactly one exchange (partial+final hash aggregate)") {
    assert(shuffles(q("q_windowed_rates")) == 1)
  }

  test("sessionize: exactly one exchange feeds windows AND the session aggregation") {
    assert(shuffles(q("q_sessionize")) == 1)
  }

  test("LWW latest: the merge shape costs exactly one exchange") {
    assert(shuffles(q("q_lww_latest")) == 1)
  }

  test("dimension joins broadcast — no sort-merge join, no shuffle of the fact side") {
    val plan = executed(q("q_join_dims"))
    assert(collectAll(plan) { case j: SortMergeJoinExec => j }.isEmpty,
      "dim join must not plan as SortMergeJoin")
    assert(collectAll(plan) { case b: BroadcastExchangeExec => b }.nonEmpty,
      "dim join must broadcast the small side")
  }

  test("ANN top-k: query side broadcasts; corpus is never shuffled before scoring") {
    val plan = executed(q("q_ann_topk"))
    assert(collectAll(plan) { case b: BroadcastExchangeExec => b }.nonEmpty)
    // the only exchange is the final per-query ranking of top-k candidates
    assert(collectAll(plan) { case e: ShuffleExchangeExec => e }.size <= 1)
  }

  test("IVF index probe: centroids broadcast; the stored inverted file shuffles once at most") {
    import org.apache.spark.sql.functions.col
    val root = tmpDir("planspec-ivf")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val idx = graft.ops.IvfIndex.create(spark, root,
      e.where(col("vec_id") >= 20).select(col("vec_id"), col("embedding")),
      k = 4, iters = 1)
    val probe = idx.search(
      e.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
      nprobe = 2, topK = 5)
    val plan = executed(probe)
    assert(collectAll(plan) { case b: BroadcastExchangeExec => b }.nonEmpty,
      "probe side must broadcast against the inverted file")
    assert(collectAll(plan) { case s: SortMergeJoinExec => s }.isEmpty,
      "the probe join must not be a sort-merge join")
    // exchanges: the per-query top-k ranking, the tiny centroid-ranking
    // window, and the tiny supersede-set aggregation (O(changes since
    // compaction), broadcast after) — the inverted file itself never
    // shuffles
    assert(collectAll(plan) { case e2: ShuffleExchangeExec => e2 }.size <= 3)
  }

  test("mart incremental readDocs: one exchange, path filter pushed to the scan") {
    // the consumer-facing read of an incrementally-refreshed mart must be
    // the standard LWW shape: one exchange, query-id filter at the scan
    import org.apache.spark.sql.functions._
    val root = tmpDir("planspec-mart")
    val mart = graft.cdc.Mart.martTable(spark, s"$root/mart")
    val rows = spark.range(10).select(
      concat(lit("k"), col("id").cast("string")).as("g"), col("id").as("n"))
    graft.cdc.Mart.publish(mart, rows, Seq("g"), "q1", 0L)
    val docs = graft.cdc.Mart.readDocs(mart, "q1")
    assert(shuffles(docs) == 1)
    val pushed = collectAll(executed(docs)) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "")
    }
    assert(pushed.exists(_.contains("EqualTo(path,q1)")),
      s"query-id filter must reach the parquet scan, got $pushed")
  }

  test("minhash pairs: ONE signature pipeline — single scan, no join (r7 shape)") {
    val plan = executed(q("q_minhash_pairs"))
    val scans = collectAll(plan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1,
      s"the md5 signature pipeline must plan exactly once (r5 self-join planned 2 scans), got ${scans.size}")
    assert(collectAll(plan) { case j: SortMergeJoinExec => j }.isEmpty &&
      collectAll(plan) { case b: BroadcastExchangeExec => b }.isEmpty,
      "bucket-combination pair generation needs no join at all")
    // spread exchange + (band,sig) aggregation + pair distinct; at
    // production scale the spread is a no-op and this drops to 2
    assert(shuffles(q("q_minhash_pairs")) <= 3)
  }

  test("ngram jaccard: every document read goes through the one shared shingle pass") {
    val plan = executed(q("q_ngram_jaccard"))
    val fileScans = collectAll(plan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(fileScans.isEmpty,
      s"all three consumers must read the cached shingle pass (r5 shape re-scanned documents 3×), got ${fileScans.size} direct scans")
    assert(collectAll(plan) { case j: SortMergeJoinExec => j }.isEmpty,
      "the tiny candidate side must broadcast, never shuffle the shingled side")
  }

  test("windowed rates scan prunes to the three referenced columns") {
    val scans = collectAll(executed(q("q_windowed_rates"))) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.requiredSchema.fieldNames.toSet
    }
    assert(scans.size == 1, s"expected exactly one scan, got ${scans.size}")
    assert(scans.forall(_ == Set("ts", "event_type", "value")),
      s"scan must read only the referenced columns, got $scans")
  }
}
