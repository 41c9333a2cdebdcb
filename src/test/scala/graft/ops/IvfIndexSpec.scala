package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** LWW-resolving inverted file semantics beyond the oracled driver query:
  * update visibility before/after compaction, supersede-set folding,
  * delete permanence, and the deterministic probe invariant. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(ids: Range, seed: Int): org.apache.spark.sql.DataFrame =
    ids.map { i =>
      val r = new scala.util.Random(seed * 10007 + i)
      (i.toLong, Array.fill(8)(r.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")

  private def topIds(idx: IvfIndex, q: org.apache.spark.sql.DataFrame): Seq[Long] =
    idx.search(q, nprobe = 4, topK = 5)
      .orderBy("rk").select("vec_id").as[Long].collect().toSeq

  test("update re-points a probe, delete removes it, compaction preserves both and folds the supersede set") {
    val root = tmpDir("ivf-lww")
    val corpus = vecs(10 until 60, seed = 1)
    val idx = IvfIndex.create(spark, root, corpus, k = 4, iters = 2)
    val q = vecs(0 until 1, seed = 9)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

    val before = topIds(idx, q)
    assert(before.size == 5)
    val target = before.head // the current best match

    // UPDATE the best match to the query's own vector → must stay/move to
    // rank 1 with sim ~1.0; DELETE the second-best → must vanish
    val second = before(1)
    val qEmb = q.select(col("q_emb").as("embedding")).as[Array[Float]].head()
    val upd = Seq((target, qEmb)).toDF("vec_id", "embedding")
    val dels = Seq(second).toDF("vec_id")
    assert(idx.upsert(upd, Some(dels), epoch = 1L))
    assert(!idx.upsert(upd, Some(dels), epoch = 1L), "replayed epoch must fence")

    val after = topIds(idx, q)
    assert(after.head == target, s"updated vector must rank first: $after")
    assert(!after.contains(second), s"deleted vector must vanish: $after")

    // the updated key surfaces ONCE (old posting superseded, not duplicated)
    val hits = idx.search(q, nprobe = 4, topK = 50)
      .where(col("vec_id") === target).count()
    assert(hits == 1L, s"superseded posting resurfaced ($hits hits)")

    // live assignments view agrees
    val live = idx.assignments.select("vec_id").as[Long].collect().toSet
    assert(!live.contains(second) && live.contains(target))
    assert(live.size == 49) // 50 - 1 deleted

    // compaction: physically folds superseded postings + empties the
    // supersede bucket; search results unchanged; reload still works
    idx.compactPostings()
    assert(idx.assignTable.files.forall(_.kind == "base"))
    val superRows = idx.assignTable
      .readBuckets(Set(IvfIndex.SuperBucket)).count()
    assert(superRows == 0L, s"supersede bucket not folded: $superRows rows")
    assert(topIds(IvfIndex.load(spark, root), q) == after,
      "compaction or reload changed probe results")

    // post-compaction maintenance still correct: delete the updated key
    assert(idx.upsert(Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"),
      Some(Seq(target).toDF("vec_id")), epoch = 2L))
    assert(!topIds(idx, q).contains(target))
  }

  test("maybeCompactPostings: metadata-only trigger — no-op under threshold, folds above it") {
    val root = tmpDir("ivf-auto")
    val idx = IvfIndex.create(spark, root, vecs(0 until 40, seed = 3), k = 4, iters = 2)
    val q = vecs(100 until 101, seed = 9)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    // build a supersede backlog: two update epochs over the same keys
    assert(idx.upsert(vecs(0 until 10, seed = 4), epoch = 1L))
    assert(idx.upsert(vecs(0 until 10, seed = 5), epoch = 2L))
    val expected = topIds(idx, q)
    val vBefore = idx.assignTable.currentVersion
    // generous bounds: decision is metadata-only, nothing must happen
    assert(!idx.maybeCompactPostings(), "backlog under default bounds must be a no-op")
    assert(idx.assignTable.currentVersion == vBefore, "no-op must not commit")
    // tight byte bound: the backlog trips it, the fold runs, results hold
    assert(idx.maybeCompactPostings(maxSupersedeBytes = 1L))
    assert(idx.assignTable.readBuckets(Set(IvfIndex.SuperBucket)).count() == 0L)
    assert(topIds(idx, q) == expected, "auto-compaction changed probe results")
    // immediately after a fold the backlog is zero → no-op again
    assert(!idx.maybeCompactPostings(maxSupersedeBytes = 1L))
  }

  test("legacy insert-only index layout is refused with a rebuild hint") {
    val root = tmpDir("ivf-legacy")
    // fake a legacy layout: 8-bucket assignments table (no supersede bucket)
    graft.lake.LakeTable.create(spark, s"$root/centroids",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cid", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))),
      numBuckets = 1)
    graft.lake.LakeTable.create(spark, s"$root/assignments",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cid", org.apache.spark.sql.types.IntegerType))),
      numBuckets = IvfIndex.AssignBuckets)
    val e = intercept[IllegalArgumentException](IvfIndex.load(spark, root))
    assert(e.getMessage.contains("rebuild"))
  }
}
