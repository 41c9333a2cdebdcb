package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class LakeTableSpec extends SparkSpec {
  import spark.implicits._

  private val baseSchema = StructType(Seq(
    StructField("repo", StringType),
    StructField("path", StringType),
    StructField("commit", StringType),
    StructField("lsn", LongType),
    StructField("lang", StringType),
    StructField("content", StringType)
  ))

  test("create → stage → commit → read round-trip; staged files invisible until commit") {
    val root = tmpDir("lake")
    val t = LakeTable.create(spark, root, baseSchema, numBuckets = 8)
    assert(t.read().count() == 0)

    val df = Seq(("r1", "a", "c1", 1L, null: String, "x"), ("r2", "b", "c1", 2L, null: String, "y"))
      .toDF(baseSchema.fieldNames.toSeq: _*)
      .withColumn("bucket", graft.cdc.LakeMerge.bucketOf(col("repo"), 8))
    val staged = t.stage(df, 0)
    assert(staged.nonEmpty)
    assert(t.read().count() == 0, "staged files must be invisible pre-commit")

    t.commit(s => s.copy(files = s.files ++ staged))
    assert(t.read().count() == 2)
    assert(t.read().schema.fieldNames.toSeq == baseSchema.fieldNames.toSeq)
  }

  test("bucket pruning reads only requested buckets") {
    val root = tmpDir("lake")
    val t = LakeTable.create(spark, root, baseSchema, numBuckets = 4)
    val df = (0 until 100).map(i => (s"repo_$i", "p", "c1", i.toLong, null: String, s"v$i"))
      .toDF(baseSchema.fieldNames.toSeq: _*)
      .withColumn("bucket", graft.cdc.LakeMerge.bucketOf(col("repo"), 4))
    val staged = t.stage(df, 0)
    t.commit(s => s.copy(files = s.files ++ staged))
    val perBucket = (0 until 4).map(b => t.readBuckets(Set(b)).count())
    assert(perBucket.sum == 100)
    assert(t.readBuckets(Set(0, 1, 2, 3)).count() == 100)
    // pruned read must not reference files of other buckets
    val snap = t.snapshot
    assert(snap.files.map(_.bucket).toSet.size > 1)
  }

  test("schema evolution: additive column + long widening, old files read as null/cast") {
    val root = tmpDir("lake")
    val narrow = StructType(Seq(
      StructField("repo", StringType), StructField("path", StringType),
      StructField("commit", StringType), StructField("lsn", IntegerType),
      StructField("content", StringType)))
    val t = LakeTable.create(spark, root, narrow, numBuckets = 2)
    val df1 = Seq(("r1", "a", "c1", 1, "x")).toDF(narrow.fieldNames.toSeq: _*)
      .withColumn("bucket", lit(0))
    t.commit(s => s.copy(files = s.files ++ t.stage(df1, 0)))

    // evolve: lsn Int→Long (widening) + new nullable lang column
    val wide = StructType(Seq(
      StructField("repo", StringType), StructField("path", StringType),
      StructField("commit", StringType), StructField("lsn", LongType),
      StructField("lang", StringType), StructField("content", StringType)))
    val sid = t.evolveSchema(wide)
    assert(sid == 1)
    val df2 = Seq(("r2", "b", "c2", 2L, "scala", "y")).toDF(wide.fieldNames.toSeq: _*)
      .withColumn("bucket", lit(1))
    t.commit(s => s.copy(files = s.files ++ t.stage(df2, sid)))

    val out = t.read().orderBy("repo").collect()
    assert(t.schema("lsn").dataType == LongType)
    assert(out.length == 2)
    assert(out(0).getAs[String]("lang") == null) // old file → null
    assert(out(1).getAs[String]("lang") == "scala")
    assert(out(0).getAs[Long]("lsn") == 1L)      // widened read
  }

  test("schema evolution: float→double widening reads old files as double") {
    val root = tmpDir("lake")
    val narrow = StructType(Seq(
      StructField("repo", StringType), StructField("path", StringType),
      StructField("score", FloatType)))
    val t = LakeTable.create(spark, root, narrow, numBuckets = 2)
    val df1 = Seq(("r1", "a", 1.5f)).toDF(narrow.fieldNames.toSeq: _*)
      .withColumn("bucket", lit(0))
    t.commit(s => s.copy(files = s.files ++ t.stage(df1, 0)))

    val wide = StructType(Seq(StructField("score", DoubleType)))
    val sid = t.evolveSchema(wide)
    assert(t.schema("score").dataType == DoubleType)
    val df2 = Seq(("r2", "b", 2.25d)).toDF("repo", "path", "score")
      .withColumn("bucket", lit(1))
    t.commit(s => s.copy(files = s.files ++ t.stage(df2, sid)))
    val out = t.read().orderBy("repo").collect()
    assert(out(0).getAs[Double]("score") == 1.5d)
    assert(out(1).getAs[Double]("score") == 2.25d)
  }

  test("evolveSchema is a no-op for an identical or narrower schema") {
    val root = tmpDir("lake")
    val t = LakeTable.create(spark, root, baseSchema, numBuckets = 2)
    val v0 = t.currentVersion
    assert(t.evolveSchema(baseSchema) == 0)
    val narrower = StructType(baseSchema.fields.filterNot(_.name == "lang"))
    assert(t.evolveSchema(narrower) == 0)
    assert(t.currentVersion == v0, "no metadata commit for no-op evolution")
  }

  test("incompatible evolution (string vs long) is rejected") {
    val root = tmpDir("lake")
    val t = LakeTable.create(spark, root, baseSchema, numBuckets = 2)
    val bad = StructType(Seq(StructField("lsn", StringType)))
    intercept[IllegalArgumentException](t.evolveSchema(bad))
  }

  test("epoch fencing: committed epochs are visible; version-hint loss is recoverable") {
    val root = tmpDir("lake")
    val t = LakeTable.create(spark, root, baseSchema, numBuckets = 2)
    assert(t.fence("q1") == -1L)
    t.commit(s => s.copy(fences = s.fences.updated("q1", 7L)))
    assert(t.fence("q1") == 7L)
    // simulate crash between swap and hint write: delete the hint
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(root, "metadata", "version-hint.text"))
    assert(t.fence("q1") == 7L, "listing fallback must recover the latest version")
  }

  test("optimistic commit retries under contention and loses no update") {
    val root = tmpDir("lake")
    val t = LakeTable.create(spark, root, baseSchema, numBuckets = 2)
    val threads = (0 until 8).map { k =>
      new Thread(() => {
        t.commit(s => s.copy(fences = s.fences.updated(s"q$k", k.toLong)), maxRetries = 100)
        ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val snap = t.snapshot
    assert((0 until 8).forall(k => snap.fences.get(s"q$k").contains(k.toLong)))
    assert(snap.version == 9) // 1 create + 8 commits
  }

  test("time travel reads an older version exactly; rollback restores it as a new commit") {
    val root = tmpDir("lake")
    val t = LakeTable.create(spark, root, baseSchema, numBuckets = 2)
    def write(tag: String, b: Int): Unit = {
      val df = Seq((s"r$tag", "p", "c1", 1L, null: String, tag))
        .toDF(baseSchema.fieldNames.toSeq: _*).withColumn("bucket", lit(b))
      t.commit(s => s.copy(files = s.files ++ t.stage(df, 0)))
    }
    write("v2", 0) // version 2
    write("v3", 1) // version 3
    val v2 = t.currentVersion - 1
    assert(t.readVersion(v2).count() == 1)
    assert(t.read().count() == 2)
    assert(t.readVersion(v2).select("content").collect()(0).getString(0) == "v2")

    val snap = t.rollback(v2)
    assert(snap.version == t.currentVersion) // rollback is a NEW commit
    assert(t.read().count() == 1, "state restored to v2 content")
    assert(t.snapshot.summary("operation") == "rollback")
    // the rolled-past version still readable (history append-only)
    assert(t.readVersion(v2 + 1).count() == 2)
  }

  test("stray tmp metadata (crash mid-commit) does not break loading or future commits") {
    val root = tmpDir("lake")
    val t = LakeTable.create(spark, root, baseSchema, numBuckets = 2)
    // simulate a crash after writing the temp metadata but before the swap
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "metadata", ".tmp-deadbeef.json"), "{garbage")
    assert(t.currentVersion == 1)
    t.commit(s => s.copy(fences = s.fences.updated("q", 1L)))
    assert(t.currentVersion == 2)
    assert(t.fence("q") == 1L)
  }

  test("a reader's snapshot stays consistent across a concurrent commit (files immutable)") {
    val root = tmpDir("lake")
    val t = LakeTable.create(spark, root, baseSchema, numBuckets = 2)
    val df1 = Seq(("r1", "a", "c1", 1L, null: String, "one"))
      .toDF(baseSchema.fieldNames.toSeq: _*).withColumn("bucket", lit(0))
    t.commit(s => s.copy(files = s.files ++ t.stage(df1, 0)))

    val readerView = t.read() // plan pinned to the v2 file list
    // writer replaces everything (compaction-style swap)
    val df2 = Seq(("r2", "b", "c2", 2L, null: String, "two"))
      .toDF(baseSchema.fieldNames.toSeq: _*).withColumn("bucket", lit(1))
    val staged = t.stage(df2, 0)
    t.commit(s => s.copy(files = staged))

    assert(readerView.collect().map(_.getAs[String]("content")).toSeq == Seq("one"),
      "pinned reader must still see its snapshot")
    assert(t.read().collect().map(_.getAs[String]("content")).toSeq == Seq("two"))
  }

  test("gcOrphans removes unreferenced staging dirs, keeps referenced files") {
    val root = tmpDir("lake")
    val t = LakeTable.create(spark, root, baseSchema, numBuckets = 2)
    val df = Seq(("r1", "a", "c1", 1L, null: String, "x"))
      .toDF(baseSchema.fieldNames.toSeq: _*).withColumn("bucket", lit(0))
    val keep = t.stage(df, 0)
    t.commit(s => s.copy(files = s.files ++ keep))
    t.stage(df, 0) // orphan: staged but never committed
    assert(t.gcOrphans() == 1)
    assert(t.read().count() == 1)
  }
}
