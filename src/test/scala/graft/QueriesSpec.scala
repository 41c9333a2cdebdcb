package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke coverage for the driver contract: every query runs at sf0.001 and
  * returns rows; entry() returns rows; every oracle key has a query. The
  * value-level cross-check against DuckDB runs driver-side (and locally via
  * tools/compare_oracle.py). */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries keys; column aliases align") {
    val qs = SparkEntry.queries
    val extra = SparkEntry.oracleSql.keySet.diff(qs.keySet)
    assert(extra.isEmpty, s"oracle entries without queries: $extra")
  }

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // every query executes and (except the pair queries, which may be empty
  // at tiny scale) returns rows
  private val mayBeEmpty = Set("q_embed_dups", "q_ngram_jaccard", "q_minhash_pairs")
  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, dir).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
