package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, seeded CDC event generator.
  *
  * Fully expression-based: every column of event `i` is a pure function of
  * `i` and the seed, so the stream is identical regardless of partitioning,
  * parallelism, or re-runs (the property the exactly-once tests lean on).
  * Repo popularity is power-law skewed (hot repos), mirroring the hot-key
  * concern the reference handles with static URL-hash partitioning
  * (reference `modules/non_summary_pipeline.py:93-111`); our engine defuses
  * it with salting + AQE instead (SURVEY.md §7.6).
  *
  * Ordering: `commit` is lexicographically monotone in event index
  * (c%012d over i / commitEvery) and `lsn` = i, so `(commit, lsn)` is a
  * total, unique order aligned with generation order.
  */
object EventGen {

  /** Per-event PRNG stream `k` for event index column `i`: a well-mixed,
    * deterministic 64-bit value via the built-in xxhash64 (codegen'd and
    * overflow-safe under ANSI mode, unlike hand-rolled splitmix multiplies). */
  private def mixStream(i: org.apache.spark.sql.Column, seed: Long, k: Int): org.apache.spark.sql.Column =
    xxhash64(i, lit(seed), lit(k))

  /** Uniform double in [0,1) from a mixed long. */
  private def unit(col: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (shiftrightunsigned(col, 11).cast("double")) / lit(9007199254740992.0) // 2^53

  /** Generate `n` change events.
    *
    * @param nRepos      distinct repos; popularity ~ power law (skew)
    * @param pathsPerRepo distinct paths per repo
    * @param skew        power-law exponent (higher = more skew); 0 = uniform
    * @param langFromLsn events with lsn >= this carry a `lang` column value
    *                    (before it, null — the additive-column evolution demo)
    * @param deleteRatio fraction of events that are tombstones
    */
  def events(
      spark: SparkSession,
      n: Long,
      seed: Long = 42L,
      nRepos: Int = 1000,
      pathsPerRepo: Int = 100,
      skew: Double = 2.0,
      commitEvery: Long = 100L,
      langFromLsn: Long = Long.MaxValue,
      deleteRatio: Double = 0.05,
      numPartitions: Int = 0
  ): DataFrame =
    eventsRange(spark, 0L, n, seed, nRepos, pathsPerRepo, skew, commitEvery,
      langFromLsn, deleteRatio, numPartitions)

  /** Events for lsn in [lo, hi) — each event is a pure function of its index,
    * so any sub-range equals the same slice of the full stream. */
  def eventsRange(
      spark: SparkSession,
      lo: Long,
      hi: Long,
      seed: Long = 42L,
      nRepos: Int = 1000,
      pathsPerRepo: Int = 100,
      skew: Double = 2.0,
      commitEvery: Long = 100L,
      langFromLsn: Long = Long.MaxValue,
      deleteRatio: Double = 0.05,
      numPartitions: Int = 0
  ): DataFrame = {
    val base =
      if (numPartitions > 0) spark.range(lo, hi, 1L, numPartitions)
      else spark.range(lo, hi)
    val i = col("id")
    val h1 = mixStream(i, seed, 1)
    val h2 = mixStream(i, seed, 2)
    val h3 = mixStream(i, seed, 3)
    val h4 = mixStream(i, seed, 4)
    // power-law repo index: floor(nRepos * u^skew) concentrates mass near 0
    val repoIdx = least(
      floor(lit(nRepos) * pow(unit(h1), lit(skew))).cast("long"),
      lit(nRepos - 1L)
    )
    val pathIdx = pmod(h2, lit(pathsPerRepo.toLong))
    val opRand = unit(h3)
    base.select(
      concat(lit("repo_"), lpad(repoIdx.cast("string"), 5, "0")).as("repo"),
      concat(
        lit("src/"),
        lpad(pmod(pathIdx, lit(10L)).cast("string"), 2, "0"),
        lit("/file_"),
        lpad(pathIdx.cast("string"), 4, "0"),
        lit(".scala")
      ).as("path"),
      format_string("c%012d", floor(i / lit(commitEvery)).cast("long")).as("commit"),
      i.as("lsn"),
      when(opRand < lit(deleteRatio), lit("D"))
        .when(opRand < lit(deleteRatio) + 0.2, lit("I"))
        .otherwise(lit("U"))
        .as("op"),
      when(
        i >= lit(langFromLsn),
        element_at(
          array(lit("scala"), lit("java"), lit("py"), lit("go"), lit("rs")),
          (pmod(h4, lit(5L)) + lit(1L)).cast("int")
        )
      ).as("lang"),
      when(opRand < lit(deleteRatio), lit(null).cast("string"))
        .otherwise(
          concat(
            lit("// content "),
            hex(h4),
            lit(" of "),
            col("id").cast("string"),
            lit("\n"),
            repeat(concat(lit("line "), hex(h2), lit(";\n")), (pmod(h3, lit(8L)) + lit(1L)).cast("int"))
          )
        )
        .as("content")
    )
  }

  /** Write the event stream as ordered parquet "binlog segments" that a
    * Structured-Streaming file source can tail (reference analog: the crawl
    * manifest listing HAR files to replay, `modules/transformation.py:53-57`).
    * Segments are written one directory, file names sorted by segment id so
    * `latestFirst=false` tailing preserves coarse order (exact order is
    * irrelevant: LWW merge is order-insensitive across batches).
    */
  def writeBinlog(
      spark: SparkSession,
      dir: String,
      n: Long,
      segments: Int,
      seed: Long = 42L,
      nRepos: Int = 1000,
      pathsPerRepo: Int = 100,
      skew: Double = 2.0,
      langFromLsn: Long = Long.MaxValue
  ): Unit =
    writeBinlogChunk(spark, dir, 0L, n, segments, segBase = 0, seed = seed,
      nRepos = nRepos, pathsPerRepo = pathsPerRepo, skew = skew,
      langFromLsn = langFromLsn)

  /** Write events [lo, hi) as `segments` binlog files numbered from
    * `segBase` — the rolling-generation building block: a LIVE soak
    * generates chunk after chunk into the tailed directory while the
    * stream consumes (and a reaper deletes) earlier ones, so the on-disk
    * binlog window stays bounded at any total event count.
    *
    * Strictly increasing mtimes by GLOBAL segment id: the streaming file
    * source orders new files by modification time, and the parquet parts
    * of one write job land within the same millisecond — without this, the
    * segment→epoch mapping (which the lineage oracle asserts) would depend
    * on directory-listing order ties. The base is pinned a day in the past
    * with 100 ms spacing, so stamps never reach the future (the source's
    * maxFileAge window is relative to the newest seen file). */
  def writeBinlogChunk(
      spark: SparkSession,
      dir: String,
      lo: Long,
      hi: Long,
      segments: Int,
      segBase: Int,
      seed: Long = 42L,
      nRepos: Int = 1000,
      pathsPerRepo: Int = 100,
      skew: Double = 2.0,
      langFromLsn: Long = Long.MaxValue
  ): Unit = {
    import java.nio.file.{Files, Paths}
    Files.createDirectories(Paths.get(dir))
    // ONE job: range with `segments` partitions yields contiguous lsn
    // slices, one parquet part per segment; flatten-rename afterwards. Each
    // file is a contiguous lsn range, so lsn predicates prune whole files
    // via parquet min/max stats.
    val tmp = Paths.get(dir, s".binlog.tmp-$segBase")
    eventsRange(spark, lo, hi, seed, nRepos, pathsPerRepo, skew,
      langFromLsn = langFromLsn, numPartitions = segments)
      .write.mode("overwrite").parquet(tmp.toString)
    val t0 = (System.currentTimeMillis() / 86400000L) * 86400000L - 86400000L
    var i = segBase
    graft.util.Fs.list(tmp).sortBy(_.toString).foreach { p =>
      if (p.getFileName.toString.endsWith(".parquet")) {
        val target = Paths.get(dir, f"segment-$i%05d.parquet")
        Files.move(p, target)
        Files.setLastModifiedTime(target,
          java.nio.file.attribute.FileTime.fromMillis(t0 + i * 100L))
        i += 1
      }
    }
    graft.util.Fs.rmTree(tmp)
  }
}
