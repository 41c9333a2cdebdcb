package graft.cdc

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.LakeTable

/** Hot-repo skew defusal (SURVEY.md §7.6): salting must spread one hot
  * bucket's write across several files/tasks without changing resolution. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("a pathological hot repo writes through multiple salted files; state unaffected") {
    val dir = tmpDir("skew")
    // 80% of events hit one repo
    val n = 20000L
    val base = EventGen.events(spark, n, nRepos = 50, pathsPerRepo = 40)
    val hot = base.withColumn("repo",
      when(pmod(col("lsn"), lit(5L)) =!= 0L, lit("repo_hot")).otherwise(col("repo")))

    val table = LakeTable.create(spark, s"$dir/table", CdcStream.binlogSchema, numBuckets = 8)
    // pin the shuffle layout: AQE's small-batch coalescing would (correctly)
    // fold this tiny batch into one partition and hide the salting mechanism
    val oldCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val oldParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try LakeMerge.mergeBatch(table, hot, Some(("skew", 0L)), saltPartitions = 8)
    finally {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", oldCoalesce)
      spark.conf.set("spark.sql.shuffle.partitions", oldParts)
    }

    val hotBucket = spark.range(1)
      .select(LakeMerge.bucketOf(lit("repo_hot"), 8)).collect()(0).getInt(0)
    val files = table.files.filter(_.bucket == hotBucket)
    assert(files.length >= 4,
      s"hot bucket should be salted across several files, got ${files.length}")
    // salting spreads bytes, not just file count: no single file dominates
    val bytes = files.map(_.bytes.toDouble)
    assert(bytes.max / bytes.sum < 0.5,
      s"hot bucket write still skewed: ${bytes.map(_.toLong).mkString(",")}")

    // resolution identical to an unsalted merge
    val t2 = LakeTable.create(spark, s"$dir/table2", CdcStream.binlogSchema, numBuckets = 8)
    LakeMerge.mergeBatch(t2, hot, Some(("skew", 0L)), saltPartitions = 1)
    val a = LakeMerge.readState(table).select($"repo", $"path", sha2($"content", 256))
      .as[(String, String, String)].collect().toSet
    val b = LakeMerge.readState(t2).select($"repo", $"path", sha2($"content", 256))
      .as[(String, String, String)].collect().toSet
    assert(a == b, "salting must not change LWW winners")
  }
}
