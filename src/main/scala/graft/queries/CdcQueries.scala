package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{CdcStream, EventGen, LakeMerge, MergeEngine}
import graft.lake.LakeTable

/** The engine's own CDC operators exposed as driver queries. The replay
  * queries run the real generator + merge engine (and for the lake variant,
  * the full fenced snapshot-commit path) and return the final state keyed by
  * sha256(content) — deterministic across runs, so the driver's rows-only
  * check is stable. No SQL oracle: DuckDB can't replay the engine.
  */
object CdcQueries {

  private val ReplayEvents = 40000L
  private val ReplayRepos = 200
  private val ReplayPaths = 20

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // In-memory batched LWW replay (no I/O): 4 batches folded through
    // MergeEngine, final live state with content hashes.
    "q_cdc_replay" -> ((s, _) => {
      val all = EventGen.events(s, ReplayEvents, nRepos = ReplayRepos,
        pathsPerRepo = ReplayPaths, langFromLsn = ReplayEvents / 2)
      var state = all.where(lit(false))
      val step = ReplayEvents / 4
      (0 until 4).foreach { b =>
        state = MergeEngine.apply(state,
          all.where(col("lsn") >= b * step && col("lsn") < (b + 1) * step))
      }
      MergeEngine.liveView(state)
        .select(col("repo"), col("path"), col("commit"), col("lsn"),
          col("lang"), sha2(col("content"), 256).as("content_sha"))
    }),

    // Full lake replay: binlog segments → streaming AvailableNow tail →
    // fenced merge commits → read back the live view.
    "q_cdc_lake_replay" -> ((s, _) => {
      val dir = Files.createTempDirectory("graft-lakereplay").toString
      EventGen.writeBinlog(s, s"$dir/binlog", 20000L, segments = 4,
        nRepos = 100, pathsPerRepo = 10, langFromLsn = 10000L)
      val table = LakeTable.create(s, s"$dir/table", CdcStream.binlogSchema, numBuckets = 8)
      val metrics = CdcStream.metricsTable(s, s"$dir/metrics")
      val q = CdcStream.start(s, table, metrics, s"$dir/binlog", s"$dir/ckpt",
        queryId = "verify-replay", maxFilesPerTrigger = 2)
      q.awaitTermination()
      LakeMerge.readState(table)
        .select(col("repo"), col("path"), col("commit"), col("lsn"),
          col("lang"), sha2(col("content"), 256).as("content_sha"))
    }),

    // Lineage/metrics sidecar rows from a replay (deterministic columns only).
    "q_cdc_lineage" -> ((s, _) => {
      val dir = Files.createTempDirectory("graft-lineage").toString
      EventGen.writeBinlog(s, s"$dir/binlog", 8000L, segments = 4,
        nRepos = 50, pathsPerRepo = 8)
      val table = LakeTable.create(s, s"$dir/table", CdcStream.binlogSchema, numBuckets = 4)
      val metrics = CdcStream.metricsTable(s, s"$dir/metrics")
      val q = CdcStream.start(s, table, metrics, s"$dir/binlog", s"$dir/ckpt",
        queryId = "verify-lineage", maxFilesPerTrigger = 1)
      q.awaitTermination()
      metrics.read()
        .select(col("query_id"), col("epoch_id"), col("batch_rows"),
          col("distinct_keys"), col("deletes"), col("min_lsn"), col("max_lsn"))
        .orderBy(col("epoch_id"))
    }),

    // Schema evolution through the lake: commit narrow batch, evolve, commit
    // wide batch, read reconciled (additive column + widened type).
    "q_schema_evolution" -> ((s, _) => {
      import org.apache.spark.sql.types._
      val dir = Files.createTempDirectory("graft-evolve").toString
      val narrow = StructType(Seq(
        StructField("repo", StringType), StructField("path", StringType),
        StructField("commit", StringType), StructField("lsn", IntegerType),
        StructField("op", StringType), StructField("content", StringType)))
      val table = LakeTable.create(s, s"$dir/table", narrow, numBuckets = 4)
      val b1 = EventGen.events(s, 2000L, nRepos = 30, pathsPerRepo = 5)
        .drop("lang").withColumn("lsn", col("lsn").cast("int"))
      LakeMerge.mergeBatch(table, b1, Some(("evolve", 0L)))
      val b2 = EventGen.events(s, 4000L, nRepos = 30, pathsPerRepo = 5,
        langFromLsn = 2000L).where(col("lsn") >= 2000L)
      LakeMerge.mergeBatch(table, b2, Some(("evolve", 1L)))
      LakeMerge.readState(table)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_rows"), max(col("lsn")).as("max_lsn"))
    })
  )

  /** No DuckDB equivalents — driver records the weaker rows-only check. */
  val oracleSql: Map[String, String] = Map.empty
}
