package graft

import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries._

/** IVF index behavior beyond the oracled nprobe=k exactness invariant:
  * pruning really shrinks the candidate set, and recall is monotone in
  * nprobe, reaching 1.0 when every cell is probed. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val e = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val corpus = e.where(col("vec_id") >= 20)
  private lazy val queries = e.where(col("vec_id") < 20)
    .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

  private lazy val cents = trainCentroids(corpus, k = 8, iters = 2)
  private lazy val cdf = cents.toDF("cid", "centroid")

  private def topIds(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private lazy val brute = topIds(
    ivfTopK(queries, corpus, cdf, nprobe = 8, topK = 10))

  private def recall(nprobe: Int): Double = {
    val got = topIds(ivfTopK(queries, corpus, cdf, nprobe, topK = 10))
    val hits = brute.map { case (q, ids) =>
      got.getOrElse(q, Set.empty).count(ids.contains).toDouble / ids.size
    }
    hits.sum / hits.size
  }

  test("training is deterministic and covers the corpus with non-empty cells") {
    val again = trainCentroids(corpus, k = 8, iters = 2)
    assert(cents == again, "same seed vectors + same iterations = same centroids")
    val sizes = assignCells(corpus, cdf).groupBy("cid").count()
      .as[(Int, Long)].collect().toMap
    assert(sizes.values.sum == corpus.count(), "every vector lands in exactly one cell")
    assert(sizes.size >= 4, s"degenerate clustering: only ${sizes.size} non-empty cells")
  }

  test("nprobe < k prunes candidates; recall is monotone and hits 1.0 at nprobe = k") {
    val total = corpus.count() * queries.count()
    val probed = {
      val cells = assignCells(corpus, cdf)
      val perCell = cells.groupBy("cid").count().as[(Int, Long)].collect().toMap
      // candidate volume for nprobe=2 = sum of the two probed cells per query
      val probes = ivfTopK(queries, corpus, cdf, nprobe = 2, topK = 1000000)
      probes.count()
    }
    assert(probed < total, s"nprobe=2 must score fewer than all $total pairs (scored $probed)")

    val r1 = recall(1); val r2 = recall(2); val r4 = recall(4); val r8 = recall(8)
    info(f"recall@10: nprobe=1 $r1%.3f, 2 $r2%.3f, 4 $r4%.3f, 8 $r8%.3f")
    assert(r1 <= r2 + 1e-9 && r2 <= r4 + 1e-9 && r4 <= r8 + 1e-9,
      "recall must be monotone in nprobe (candidate sets are nested)")
    assert(math.abs(r8 - 1.0) < 1e-9, "probing every cell is exact")
    assert(r1 > 0.0, "even one probed cell finds some true neighbors")
  }

  test("persisted IVF index: incremental append equals from-scratch assignment; reload probes without rebuild") {
    val root = tmpDir("ivfidx")
    val initial = corpus.where(col("vec_id") < 60).select(col("vec_id"), col("embedding"))
    val arrived = corpus.where(col("vec_id") >= 60).select(col("vec_id"), col("embedding"))
    val idx = graft.ops.IvfIndex.create(spark, root, initial, k = 8, iters = 2)

    assert(idx.append(arrived, fence = Some(("maint", 1L))), "first epoch must apply")
    assert(!idx.append(arrived, fence = Some(("maint", 1L))), "replayed epoch must be fenced")

    // incremental inverted file == assigning the FULL corpus against the
    // same frozen centroids in one shot (old rows were never re-assigned)
    val reloaded = graft.ops.IvfIndex.load(spark, root)
    val stored = reloaded.assignments.select("vec_id", "cid")
      .as[(Long, Int)].collect().toMap
    val scratch = assignCells(corpus, reloaded.centroids)
      .select("vec_id", "cid").as[(Long, Int)].collect().toMap
    assert(stored == scratch, "incremental index diverged from from-scratch assignment")

    // reloaded probe at nprobe = k over the stored file == brute force over
    // everything indexed (initial ∪ arrived = the whole corpus here)
    val viaIndex = topIds(reloaded.search(queries, nprobe = 8, topK = 10))
    assert(viaIndex == brute, "reloaded index probe diverged from brute force")

    // the index is snapshot-versioned: the append is a distinct, fenced
    // commit on the assignment table
    assert(reloaded.assignTable.fence("maint") == 1L)
    assert(reloaded.assignTable.currentVersion >= 3)
  }

  test("syncFromChangelog: new keys indexed once, updates/redelivery don't duplicate postings") {
    import graft.cdc.{CdcStream, EventGen, LakeMerge}
    import graft.lake.LakeTable
    val dir = tmpDir("ivfsync")
    // deterministic embedding derived from the live row's key (stable
    // under content updates, so an updated key maps to the same vector —
    // matching the insert-only contract this test pins)
    val vecId = xxhash64(col("repo"), col("path"))
    val emb = array((0 until 8).map(i =>
      (xxhash64(col("repo"), col("path"), lit(i)) / lit(9.223372036854776e18)).cast("float")): _*)

    val source = LakeTable.create(spark, s"$dir/src", CdcStream.binlogSchema, numBuckets = 4)
    LakeMerge.mergeBatch(source,
      EventGen.events(spark, 1000L, nRepos = 20, pathsPerRepo = 5), Some(("ing", 0L)))
    val live0 = LakeMerge.readState(source)
    val idx = graft.ops.IvfIndex.create(spark, s"$dir/idx",
      live0.select(vecId.as("vec_id"), emb.as("embedding")), k = 4, iters = 1)
    val v0 = source.currentVersion
    val n0 = idx.assignments.count()

    // epoch 1: updates to EXISTING keys + two brand-new keys
    LakeMerge.mergeBatch(source,
      EventGen.eventsRange(spark, 1000L, 1200L, nRepos = 20, pathsPerRepo = 5)
        .unionByName(Seq(
          ("brand_new_1", "p", "c999999999999", 999999L, "U", null, "fresh one"),
          ("brand_new_2", "p", "c999999999999", 999998L, "U", null, "fresh two"))
          .toDF("repo", "path", "commit", "lsn", "op", "lang", "content")),
      Some(("ing", 1L)))

    assert(idx.syncFromChangelog(source, v0, source.currentVersion, vecId, emb))
    assert(!idx.syncFromChangelog(source, v0, source.currentVersion, vecId, emb),
      "replayed sync epoch must fence")

    // LWW maintenance: live changelog winners upserted (updates re-point,
    // no duplicate postings), tombstoned winners DELETED from the index
    val initialIds = live0.select(vecId).as[Long].collect().toSet
    val resolvedChanges = graft.cdc.MergeEngine.dedupBatch(
      source.readChangesBetween(v0, source.currentVersion))
    val winnerIds = graft.cdc.MergeEngine.liveView(resolvedChanges)
      .select(vecId).as[Long].collect().toSet
    val deletedIds = resolvedChanges.where(col("op") === "D")
      .select(vecId).as[Long].collect().toSet
    val ids = idx.assignments.select("vec_id").as[Long].collect().toSet
    assert(ids == (initialIds ++ winnerIds) -- deletedIds,
      "indexed set != (initial ∪ changelog winners) − tombstoned keys")
    assert(ids.size.toLong == idx.assignments.count(), "duplicate postings in the inverted file")
    assert(idx.assignments.count() > n0, "new keys must have been appended")
    val newIds = Seq(("brand_new_1", "p"), ("brand_new_2", "p")).map { case (r, p) =>
      spark.range(1).select(xxhash64(lit(r), lit(p))).as[Long].collect().head
    }
    assert(newIds.forall(ids.contains), "new keys missing from the index")
    // and the new postings landed in their correct cells
    val scratch = assignCells(
      idx.assignments.select(col("vec_id"), col("embedding")), idx.centroids)
      .select("vec_id", "cid").as[(Long, Int)].collect().toMap
    val stored = idx.assignments.select("vec_id", "cid").as[(Long, Int)].collect().toMap
    assert(stored == scratch)
  }
}
