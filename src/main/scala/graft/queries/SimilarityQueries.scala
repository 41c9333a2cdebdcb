package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]` column):
  * brute-force cosine top-k as the correctness baseline; an LSH
  * (sign-bit-bucketed) variant as the scale path — candidates restricted to
  * one bucket turn the O(n·q) scan into an equi-join.
  */
object SimilarityQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** Sequential-fold cosine similarity over two float/double-array columns,
    * in double precision — bit-identical to DuckDB's list_cosine_similarity
    * on DOUBLE[] (both are left-to-right folds). Round-7 shape #2: the
    * fused [[graft.exprs.CosineSim]] kernel (one loop per row) replaces the
    * triple interpreted HOF fold `aggregate(zip_with(a,b,x*y)) /
    * (sqrt(aggregate(a,v*v)) * sqrt(aggregate(b,v*v)))` — identical
    * accumulation order and null semantics, asserted in VectorOpsSpec and
    * pinned by the ANN/embed oracles. */
  def cosine(a: Column, b: Column): Column =
    graft.exprs.VectorOps.cosineSim(a, b)

  /** 8-bit sign-LSH bucket from the first 8 dimensions. */
  def signBucket(emb: Column): Column =
    (0 until 8).map { b =>
      when(element_at(emb, b + 1) > 0.0f, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  // ---------------------------------------------------------------- IVF

  /** Deterministic k-means centroid training (Lloyd), the IVF coarse
    * quantizer. Idiomatic Spark shape: the corpus stays distributed, the k
    * centroids are collected and re-broadcast each iteration (k·dim is
    * driver-tiny at any corpus scale; at 100 TB you train on a sample and
    * the assignment below is the full-data pass). Seeds are the k
    * lowest-vec_id corpus vectors, so training is reproducible. */
  def trainCentroids(corpus: DataFrame, k: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var cents: Seq[(Int, Seq[Double])] = corpus.orderBy(col("vec_id")).limit(k)
      .select(col("embedding")).as[Seq[Float]].collect()
      .toSeq.zipWithIndex.map { case (e, i) => (i, e.map(_.toDouble)) }
    (0 until iters).foreach { _ =>
      val cdf = cents.toDF("cid", "centroid")
      val assigned = assignCells(corpus, cdf)
      val updated = assigned
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("v")).as("m"))
        .groupBy(col("cid"))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("centroid"))
        .as[(Int, Seq[Double])].collect().toMap
      // empty cells keep their old centroid (standard Lloyd fallback)
      cents = cents.map { case (cid, old) => (cid, updated.getOrElse(cid, old)) }
    }
    cents
  }

  /** Rank the k broadcast centroids per row of `vectors` by cosine against
    * `embCol` and keep the top `n` — THE one ranking used for both cell
    * assignment (n=1) and query probing (n=nprobe), so a tie-break or
    * scoring change can never make the two drift apart (the nested-
    * candidate-set monotonicity the recall tests assert depends on that).
    * The vectors side never shuffles its payload beyond one exchange of
    * the already-pruned top-n rows (partial WindowGroupLimit). */
  private[graft] def rankCells(vectors: DataFrame, centroids: DataFrame,
      idCol: String, embCol: String, n: Int): DataFrame = {
    val scored = vectors.crossJoin(broadcast(centroids))
      .withColumn("sim_c", cosine(col(embCol), col("centroid")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("sim_c").desc, col("cid").asc)
    scored.withColumn("rk_c", row_number().over(w)).where(col("rk_c") <= n)
      .drop("rk_c", "sim_c", "centroid")
  }

  /** Assign every corpus vector to its nearest centroid (max cosine) — the
    * inverted file. One broadcast nested-loop over k tiny centroids, then
    * an argmax per row; the corpus is never re-shuffled for scoring. */
  def assignCells(corpus: DataFrame, centroids: DataFrame): DataFrame =
    rankCells(corpus, centroids, "vec_id", "embedding", n = 1)

  /** IVF search: rank cells per query by centroid similarity, probe the top
    * `nprobe`, score only vectors in probed cells. At nprobe = k this MUST
    * return exactly the brute-force top-k (the oracled invariant); at
    * nprobe < k it is the scale path — candidate volume drops to
    * ~nprobe/k of the corpus, and the probe join is an equi-join on cid. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      centroids: DataFrame, nprobe: Int, topK: Int): DataFrame = {
    val cells = assignCells(corpus, centroids) // (vec_id, embedding, cid)
    val probes = rankCells(queries, centroids, "query_id", "q_emb", n = nprobe)
      .select(col("query_id"), col("q_emb"), col("cid"))
    val scored = cells.join(broadcast(probes), Seq("cid"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("sim_raw"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim_raw").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= topK)
      .select(col("query_id"), col("vec_id"), round(col("sim_raw"), 4).as("sim"), col("rk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-10 per query vector (query = vec_id < 5,
    // corpus = the rest). Broadcast the tiny query side; rank on the raw
    // double (deterministic), emit rounded.
    "q_ann_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      // Round-7 note: spreading the corpus scan (guide §2.5) was tried and
      // measured WORSE (0.35-0.41 s warm vs 0.24-0.38 baseline): ~2000
      // 64-dim cosine folds are too little work to pay for an exchange.
      val c = e.where(col("vec_id") >= 5)
      val scored = c.join(broadcast(q))
        .select(col("query_id"), col("vec_id"),
          cosine(col("q_emb"), col("embedding")).as("sim_raw"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("sim_raw").desc, col("vec_id").asc)
      scored.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 10)
        .select(col("query_id"), col("vec_id"), round(col("sim_raw"), 4).as("sim"), col("rk"))
    }),

    // LSH-bucketed ANN: search only the query's sign bucket — the 100 TB
    // path (bucket equi-join instead of full cross product), top-3.
    "q_ann_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .withColumn("bucket", signBucket(col("embedding")))
      val q = e.where(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("bucket"))
      val c = e.where(col("vec_id") >= 20)
      val scored = c.join(broadcast(q), Seq("bucket"))
        .select(col("query_id"), col("vec_id"), col("bucket"),
          cosine(col("q_emb"), col("embedding")).as("sim_raw"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("sim_raw").desc, col("vec_id").asc)
      scored.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("query_id"), col("vec_id"), col("bucket"),
          round(col("sim_raw"), 4).as("sim"), col("rk"))
    }),

    // IVF ANN with every cell probed: the index machinery (deterministic
    // k-means coarse quantizer → inverted-file assignment → probe join)
    // must return EXACTLY the brute-force top-k — the invariant that makes
    // nprobe < k trustworthy at scale (recall behavior is unit-tested in
    // SimilaritySpec; this oracles the plumbing).
    "q_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val corpus = e.where(col("vec_id") >= 5)
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val cents = trainCentroids(corpus, k = 8, iters = 2)
      import s.implicits._
      ivfTopK(q, corpus, cents.toDF("cid", "centroid"), nprobe = 8, topK = 10)
    }),

    // IVF index as a persisted ARTIFACT: train+assign on the initial corpus
    // slice, persist as snapshot-versioned lake tables, then new vectors
    // "arrive" and are appended under an epoch fence (no retrain, no
    // re-assignment of old rows — incremental maintenance), a redelivered
    // epoch is a no-op, the index is RELOADED from disk, and the probe over
    // the stored inverted file must equal brute force over the full corpus.
    "q_ann_ivf_index" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val root = java.nio.file.Files.createTempDirectory("graft-ivfidx").toString
      val idx = graft.ops.IvfIndex.create(s, root,
        e.where(col("vec_id") >= 5 && col("vec_id") < 300)
          .select(col("vec_id"), col("embedding")),
        k = 8, iters = 2)
      // a later merge epoch delivers new vectors; index appends incrementally
      val arrived = e.where(col("vec_id") >= 300).select(col("vec_id"), col("embedding"))
      assert(idx.append(arrived, fence = Some(("ivf-maint", 1L))))
      // crash-replay of the same epoch: fenced no-op
      assert(!idx.append(arrived, fence = Some(("ivf-maint", 1L))))
      // restart: reload the artifact from disk, probe without rebuilding
      graft.ops.IvfIndex.load(s, root).search(q, nprobe = 8, topK = 10)
    }),

    // INCREMENTAL RETRAIN (VERDICT r5 #4): the arrival epoch piles new
    // vectors into the create-time cells; retrainCells splits every cell
    // above the mean into locally-trained sub-centroids and re-points ONLY
    // the affected buckets' postings (3 crash-safe commits, no rebuild).
    // Probing ALL cells of the reloaded index must still equal brute force
    // over the full corpus — splitting can move postings between cells but
    // must never lose or duplicate one (the DuckDB oracle is the same
    // brute-force top-k as q_ann_ivf_index).
    "q_ann_ivf_retrain" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val root = java.nio.file.Files.createTempDirectory("graft-ivfret").toString
      val idx = graft.ops.IvfIndex.create(s, root,
        e.where(col("vec_id") >= 5 && col("vec_id") < 300)
          .select(col("vec_id"), col("embedding")),
        k = 8, iters = 2)
      assert(idx.append(
        e.where(col("vec_id") >= 300).select(col("vec_id"), col("embedding")),
        fence = Some(("ivf-maint", 1L))))
      val total = idx.assignments.count()
      // target = the mean: any above-average cell splits (deterministic)
      val split = idx.retrainCells(targetPerCell = total / 8 + 1)
      assert(split.nonEmpty, "the arrival epoch must overload at least one cell")
      val reloaded = graft.ops.IvfIndex.load(s, root)
      val nCells = reloaded.centroids.count().toInt
      assert(nCells > 8, "split must add sub-cells")
      reloaded.search(q, nprobe = nCells, topK = 10)
    }),

    // LWW-resolving inverted file: the index follows a CDC source through
    // UPDATES and DELETES without rebuild. Epoch 0 indexes vec_ids [5,300);
    // epoch 1 UPDATES [5,50) to the embedding of vec_id+200 and DELETES
    // [50,60); syncFromChangelog turns the source changelog into postings +
    // supersede rows (one atomic commit, O(changes), no index scan); a
    // replayed sync is a fenced no-op. With nprobe = k the probe must equal
    // brute force over the EFFECTIVE corpus — updated embeddings in force,
    // deleted keys gone — which the DuckDB oracle recomputes from the
    // embeddings parquet alone.
    "q_ann_ivf_update" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val e = t(s, dir, "embeddings")
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val root = java.nio.file.Files.createTempDirectory("graft-ivfupd").toString
      val srcSchema = StructType(Seq(
        StructField("repo", StringType), StructField("path", StringType),
        StructField("commit", StringType), StructField("lsn", LongType),
        StructField("op", StringType),
        StructField("embedding", ArrayType(FloatType))))
      val src = graft.lake.LakeTable.create(s, s"$root/src", srcSchema, numBuckets = 4)
      def rows(df: org.apache.spark.sql.DataFrame, epoch: Int, op: String) = df.select(
        col("vec_id").cast("string").as("repo"), lit("v").as("path"),
        format_string("c%09d", lit(epoch)).as("commit"),
        (lit(epoch * 100000L) + col("vec_id")).as("lsn"), lit(op).as("op"),
        (if (op == "D") lit(null).cast("array<float>") else col("embedding")).as("embedding"))
      graft.cdc.LakeMerge.mergeBatch(src,
        rows(e.where(col("vec_id") >= 5 && col("vec_id") < 300), 0, "U"),
        Some(("ivfsrc", 0L)))
      val v0 = src.currentVersion
      val idx = graft.ops.IvfIndex.create(s, s"$root/idx",
        graft.cdc.LakeMerge.readState(src)
          .select(col("repo").cast("long").as("vec_id"), col("embedding")),
        k = 8, iters = 2)
      // epoch 1: updates re-embed [5,50) (to the vector of vec_id+200),
      // deletes remove [50,60)
      val updates = e.as("a").where(col("a.vec_id") >= 5 && col("a.vec_id") < 50)
        .join(e.as("b"), col("b.vec_id") === col("a.vec_id") + 200)
        .select(col("a.vec_id").as("vec_id"), col("b.embedding").as("embedding"))
      val dels = e.where(col("vec_id") >= 50 && col("vec_id") < 60)
        .select(col("vec_id"), col("embedding"))
      graft.cdc.LakeMerge.mergeBatch(src,
        rows(updates, 1, "U").unionByName(rows(dels, 1, "D")),
        Some(("ivfsrc", 1L)))
      val v1 = src.currentVersion
      assert(idx.syncFromChangelog(src, v0, v1,
        col("repo").cast("long"), col("embedding")))
      // crash-replay of the same maintenance epoch: fenced no-op
      assert(!idx.syncFromChangelog(src, v0, v1,
        col("repo").cast("long"), col("embedding")))
      graft.ops.IvfIndex.load(s, s"$root/idx").search(q, nprobe = 8, topK = 10)
    })
  )

  val oracleSql: Map[String, String] = Map(
    // probing all cells makes IVF exactly brute force — same oracle shape
    "q_ann_ivf" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |         list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS sim_raw
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id >= 5),
        |ranked AS (
        |  SELECT query_id, vec_id, sim_raw,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, vec_id ASC) AS rk
        |  FROM scored)
        |SELECT query_id, vec_id, round(sim_raw, 4) AS sim, rk
        |FROM ranked WHERE rk <= 10""".stripMargin,

    // full-corpus brute force: the persisted index (initial build + fenced
    // incremental appends, reloaded from disk) must lose nothing
    "q_ann_ivf_index" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |         list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS sim_raw
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id >= 5),
        |ranked AS (
        |  SELECT query_id, vec_id, sim_raw,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, vec_id ASC) AS rk
        |  FROM scored)
        |SELECT query_id, vec_id, round(sim_raw, 4) AS sim, rk
        |FROM ranked WHERE rk <= 10""".stripMargin,

    // same brute-force oracle: retrain moves postings between cells but a
    // full probe must lose nothing
    "q_ann_ivf_retrain" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |         list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS sim_raw
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id >= 5),
        |ranked AS (
        |  SELECT query_id, vec_id, sim_raw,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, vec_id ASC) AS rk
        |  FROM scored)
        |SELECT query_id, vec_id, round(sim_raw, 4) AS sim, rk
        |FROM ranked WHERE rk <= 10""".stripMargin,

    // effective corpus after the CDC epoch: [5,50) re-embedded to the
    // vector of vec_id+200, [50,60) deleted, rest unchanged
    "q_ann_ivf_update" ->
      """WITH corpus AS (
        |  SELECT e.vec_id,
        |         CASE WHEN e.vec_id < 50 THEN u.embedding ELSE e.embedding END AS embedding
        |  FROM embeddings e LEFT JOIN embeddings u ON u.vec_id = e.vec_id + 200
        |  WHERE e.vec_id >= 5 AND e.vec_id < 300
        |    AND NOT (e.vec_id >= 50 AND e.vec_id < 60)),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |         list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS sim_raw
        |  FROM embeddings q JOIN corpus c ON q.vec_id < 5),
        |ranked AS (
        |  SELECT query_id, vec_id, sim_raw,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, vec_id ASC) AS rk
        |  FROM scored)
        |SELECT query_id, vec_id, round(sim_raw, 4) AS sim, rk
        |FROM ranked WHERE rk <= 10""".stripMargin,

    "q_ann_topk" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        |         list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS sim_raw
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id >= 5),
        |ranked AS (
        |  SELECT query_id, vec_id, sim_raw,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, vec_id ASC) AS rk
        |  FROM scored)
        |SELECT query_id, vec_id, round(sim_raw, 4) AS sim, rk
        |FROM ranked WHERE rk <= 10""".stripMargin,

    "q_ann_lsh" ->
      """WITH b AS (
        |  SELECT vec_id, embedding,
        |         (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END * 1 +
        |          CASE WHEN embedding[2] > 0 THEN 1 ELSE 0 END * 2 +
        |          CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END * 4 +
        |          CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END * 8 +
        |          CASE WHEN embedding[5] > 0 THEN 1 ELSE 0 END * 16 +
        |          CASE WHEN embedding[6] > 0 THEN 1 ELSE 0 END * 32 +
        |          CASE WHEN embedding[7] > 0 THEN 1 ELSE 0 END * 64 +
        |          CASE WHEN embedding[8] > 0 THEN 1 ELSE 0 END * 128) AS bucket
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, q.bucket AS bucket,
        |         list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS sim_raw
        |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id < 20 AND c.vec_id >= 20),
        |ranked AS (
        |  SELECT query_id, vec_id, bucket, sim_raw,
        |         row_number() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, vec_id ASC) AS rk
        |  FROM scored)
        |SELECT query_id, vec_id, cast(bucket AS BIGINT) AS bucket, round(sim_raw, 4) AS sim, rk
        |FROM ranked WHERE rk <= 3""".stripMargin
  )
}
