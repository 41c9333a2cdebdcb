package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.LakeTable
import graft.queries.SimilarityQueries

/** IVF ANN index persisted as a lake-table ARTIFACT (VERDICT r3 #8): the
  * trained coarse quantizer (centroids) and the inverted file (cell
  * assignments) live in two snapshot-versioned [[LakeTable]]s under one
  * root, so the index
  *
  *  - survives restarts (reload = [[IvfIndex.load]], no retraining, no
  *    re-assignment pass),
  *  - is incrementally maintainable: [[append]] assigns ONLY the new
  *    vectors against the frozen centroids and appends them under an epoch
  *    fence — the idempotent-redelivery contract the CDC merge uses, so an
  *    index-maintenance step replayed after a crash is a no-op, and
  *  - serves probes without touching the corpus: [[search]] is a
  *    centroid-rank (broadcast, k·dim tiny) + an equi-join against the
  *    stored inverted file, pruned to `nprobe` cells.
  *
  * Scale posture: centroids are O(k·dim) — driver/broadcast-tiny at any
  * corpus size. Assignments are bucketed BY CELL ID, so a probe of p cells
  * reads ~p/numBuckets of the index files (metadata pruning), never the
  * whole corpus; at 100 TB the assignment append is one embarrassingly
  * parallel scan of the new vectors per merge epoch.
  */
final class IvfIndex private (
    val centroidTable: LakeTable,
    val assignTable: LakeTable
) {

  /** The frozen coarse quantizer: (cid, centroid). */
  def centroids: DataFrame =
    centroidTable.read().select(col("cid"), col("centroid"))

  /** The inverted file: (vec_id, cid, embedding). */
  def assignments: DataFrame =
    assignTable.read().select(col("vec_id"), col("cid"), col("embedding"))

  /** Assign `vectors` (vec_id, embedding) to their nearest stored centroid
    * and append them to the inverted file. `fence` = (queryId, epochId)
    * makes per-merge-epoch maintenance exactly-once: a redelivered epoch is
    * skipped. Returns false when fenced off.
    *
    * Contract: the inverted file is append-only — feeding a vec_id that is
    * already indexed appends a second posting (both would then surface in
    * probes). Use the epoch fence for crash-replay dedup; for a corpus with
    * UPDATES, derive `vectors` from the source table's changelog winners so
    * each maintenance epoch carries a key at most once, or rebuild. */
  def append(vectors: DataFrame, fence: Option[(String, Long)] = None): Boolean = {
    if (fence.exists { case (q, e) => assignTable.fence(q) >= e }) return false
    val assigned = SimilarityQueries
      .assignCells(vectors, broadcastableCentroids(vectors.sparkSession))
      .select(col("vec_id"), col("cid"), col("embedding"))
      .withColumn("bucket", pmod(col("cid"), lit(IvfIndex.AssignBuckets)).cast("int"))
    val staged = assignTable.stage(assigned, assignTable.snapshot.schemaId, kind = "delta")
    assignTable.appendCommit(staged, fence = fence,
      summary = Map("operation" -> "ivf-append"))
    true
  }

  /** Maintain the index from a CDC source table's CHANGELOG: take the LWW
    * winners of the commits in (fromVersion, toVersion], derive (vec_id,
    * embedding) rows via the caller's column expressions, drop keys the
    * index already holds (anti-join — makes overlapping version ranges
    * safe on top of the epoch fence), and append the remainder.
    *
    * Insert-only maintenance: an UPDATED document keeps its original
    * posting (the anti-join skips the new embedding) and a DELETED one
    * stays indexed — acceptable for append-mostly corpora between index
    * rebuilds; an LWW-resolving inverted file (postings as CDC rows) is
    * the upgrade path if updates must be visible without rebuild.
    *
    * @param vecId     expression over the source's live columns yielding a
    *                  unique long id (e.g. `xxhash64(col("repo"), col("path"))`)
    * @param embedding expression yielding the `array<float>` vector */
  def syncFromChangelog(
      source: graft.lake.LakeTable,
      fromVersion: Int,
      toVersion: Int,
      vecId: org.apache.spark.sql.Column,
      embedding: org.apache.spark.sql.Column,
      fence: Option[(String, Long)] = None
  ): Boolean = {
    if (fence.exists { case (q, e) => assignTable.fence(q) >= e }) return false
    val winners = graft.cdc.MergeEngine.liveView(
      graft.cdc.MergeEngine.dedupBatch(source.readChangesBetween(fromVersion, toVersion)))
    val vecs = winners.select(vecId.cast("long").as("vec_id"), embedding.as("embedding"))
      .where(col("embedding").isNotNull)
    val fresh = vecs.join(assignments.select(col("vec_id")), Seq("vec_id"), "left_anti")
    append(fresh, fence)
  }

  /** Top-`topK` per query over the stored index: rank cells per query
    * against the broadcast centroids, probe the best `nprobe`, score only
    * stored vectors in probed cells. With nprobe = k this returns exactly
    * the brute-force answer over every indexed vector — the oracle
    * invariant; with nprobe < k it is the scale path (probe equi-join +
    * bucket-pruned index read). */
  def search(queries: DataFrame, nprobe: Int, topK: Int): DataFrame = {
    val spark = queries.sparkSession
    val probes = SimilarityQueries
      .rankCells(queries, broadcastableCentroids(spark), "query_id", "q_emb", n = nprobe)
      .select(col("query_id"), col("q_emb"), col("cid"))
    val scored = assignments.join(broadcast(probes), Seq("cid"))
      .select(col("query_id"), col("vec_id"),
        SimilarityQueries.cosine(col("q_emb"), col("embedding")).as("sim_raw"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim_raw").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= topK)
      .select(col("query_id"), col("vec_id"), round(col("sim_raw"), 4).as("sim"), col("rk"))
  }

  /** Centroids re-read fresh per use (they are tiny); kept as a DataFrame
    * so Catalyst broadcasts them wherever they join. */
  private def broadcastableCentroids(spark: SparkSession): DataFrame = centroids
}

object IvfIndex {

  /** Inverted-file bucket count: assignments are bucketed by cid so probe
    * reads prune at file level. */
  val AssignBuckets = 8

  private val centroidSchema = StructType(Seq(
    StructField("cid", IntegerType),
    StructField("centroid", ArrayType(DoubleType))))

  private val assignSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("cid", IntegerType),
    StructField("embedding", ArrayType(FloatType))))

  /** Train on `corpus` (vec_id, embedding) and persist the artifact:
    * centroid table + fully-assigned inverted file under `root`. */
  def create(spark: SparkSession, root: String, corpus: DataFrame,
      k: Int, iters: Int): IvfIndex = {
    import spark.implicits._
    val cents = SimilarityQueries.trainCentroids(corpus, k, iters)
    val ct = LakeTable.create(spark, s"$root/centroids", centroidSchema, numBuckets = 1)
    val cdf = cents.toDF("cid", "centroid").withColumn("bucket", lit(0))
    ct.appendCommit(ct.stage(cdf, 0), summary = Map("operation" -> "ivf-train"))
    val at = LakeTable.create(spark, s"$root/assignments", assignSchema, numBuckets = AssignBuckets)
    val idx = new IvfIndex(ct, at)
    idx.append(corpus, fence = Some(("ivf-build", 0L)))
    idx
  }

  /** Reload a persisted index — no retraining, no assignment pass. */
  def load(spark: SparkSession, root: String): IvfIndex =
    new IvfIndex(
      LakeTable.load(spark, s"$root/centroids"),
      LakeTable.load(spark, s"$root/assignments"))
}
