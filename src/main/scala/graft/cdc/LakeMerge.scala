package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.{DataFileMeta, LakeTable, Snapshot}

/** Result of applying one batch onto the lake table. `distinctKeys` is the
  * exact distinct (repo, path) count of the batch, read for FREE from the
  * staged files' footer row counts when the merge deduped on write (each
  * output row is one key); -1 when the write path didn't dedup (L0 / raw
  * deltas) — unknown without an extra pass the hot path refuses to pay. */
final case class CommitStats(
    applied: Boolean,
    epochId: Long,
    snapshotId: Long,
    batchBytes: Long,
    touchedBuckets: Int,
    wallMs: Long,
    distinctKeys: Long = -1L
)

/** Key-partitioned MERGE INTO of change-event batches onto a [[LakeTable]]
  * (SURVEY.md §7.2/§7.3) — merge-on-read design:
  *
  *  - each batch is LWW-deduped and APPENDED as per-bucket delta files
  *    (work per batch ∝ batch size, never ∝ table size — the property that
  *    keeps 10^10-event replay linear; a copy-on-write full-bucket rewrite
  *    per micro-batch would re-shuffle the whole table every batch)
  *  - reads resolve base ∪ deltas with the same single max_by aggregation
  *    (LWW is idempotent, so even redundant rows from a crashed-then-
  *    replayed append cannot change the resolved state)
  *  - [[compact]] folds deltas into per-bucket base files when they pile up
  *    (bounded read amplification), under the same atomic snapshot commit
  *  - epoch fencing makes redelivered batches no-ops (exactly-once)
  */
object LakeMerge {

  /** Bucket assignment — the table's partition function. Deterministic pure
    * expression over `repo` (analog of the reference's URL-hash partition
    * routing, `modules/non_summary_pipeline.py:93-111`, minus the magic
    * error-partition index: parse failures are routed to a dead-letter
    * metric instead). Delegates to [[LakeTable.bucketExpr]] — the single
    * definition both the write path and the L0 row-filtering reads use. */
  def bucketOf(repoCol: org.apache.spark.sql.Column, numBuckets: Int): org.apache.spark.sql.Column =
    LakeTable.bucketExpr(repoCol, numBuckets)

  /** Raw resolved state (tombstones retained): LWW over base ∪ deltas. */
  def resolvedState(table: LakeTable): DataFrame =
    MergeEngine.dedupBatch(table.read())

  /** Consumer-facing current state: resolved, tombstones filtered, op dropped. */
  def readState(table: LakeTable): DataFrame =
    MergeEngine.liveView(resolvedState(table))

  /** Register the current live state as a SQL temp view — SQL-as-source
    * (the reference reads BigQuery SQL as a pipeline source,
    * `modules/tech_report_pipeline.py:156`): `spark.sql(s"... FROM $name")`
    * then runs any relational stage over the resolved table. */
  def registerView(table: LakeTable, name: String): Unit = {
    readState(table).createOrReplaceTempView(name)
    ()
  }

  /** Point lookup: the current live state of ONE repo. Metadata pruning
    * reads only that repo's hash bucket (1/numBuckets of the table) plus
    * any not-yet-compacted L0 files (bounded by the flush trigger), then
    * filters and resolves — at 100 TB this touches a handful of files, not
    * the table. The residual repo filter is pushed into the parquet scan. */
  def readRepo(table: LakeTable, repo: String): DataFrame = {
    // three-level metadata pruning, all driver-side (zero Spark jobs before
    // the action): per-era hash bucket (1/numBuckets of the files, probed
    // under EVERY layout the table has written — bucket evolution), then
    // per-file key bloom (only the files that actually carry the key), then
    // the parquet-pushed residual filter below
    MergeEngine.liveView(
      MergeEngine.dedupBatch(
        table.readForKey(repo).where(col("repo") === repo)))
  }

  /** Multi-key point lookup: the live state of a SET of repos, with the
    * same three-level metadata pruning as [[readRepo]] applied per key
    * over ONE read plan (SQL `repo IN (…)` routes here). */
  def readRepos(table: LakeTable, repos: Seq[String]): DataFrame =
    MergeEngine.liveView(
      MergeEngine.dedupBatch(
        table.readForKeys(repos).where(col("repo").isin(repos: _*))))

  /** The write-aligned single-exchange LWW shape shared by the classic
    * merge path and every compaction: repartition by (bucket, salt), then
    * dedup to the per-key winner — the groupBy REUSES the exchange
    * (partitioning ⊂ grouping keys), so intra-batch LWW dedup and the
    * file-layout shuffle are ONE exchange; each task holds exactly one
    * (bucket, salt) group → one output file. Salt fans a hot bucket across
    * tasks (SURVEY.md §7.6) without changing winners. */
  private def lwwWriteShape(
      df: DataFrame,
      nBuckets: Int,
      fieldNames: Seq[String],
      saltPartitions: Int
  ): DataFrame = {
    val payload = fieldNames.filterNot(MergeEngine.keyCols.contains)
    df.withColumn("bucket", bucketOf(col("repo"), nBuckets))
      .withColumn("_salt", pmod(xxhash64(col("path")), lit(saltPartitions.toLong)))
      .repartition(col("bucket"), col("_salt"))
      .groupBy(col("bucket"), col("_salt"), col("repo"), col("path"))
      .agg(max_by(struct(payload.map(col).toSeq: _*),
        struct(col("commit"), col("lsn"))).as("_w"))
      .select(col("bucket") +: col("repo") +: col("path") +:
        payload.map(c => col(s"_w.$c").as(c)).toSeq: _*)
  }

  /** Apply one batch of change events.
    *
    * Classic mode LWW-dedups the batch and appends it as per-bucket delta
    * files through ONE write-aligned exchange. L0 mode appends the batch
    * with ZERO exchange: each input task's rows stream straight into an
    * "L0" file spanning buckets (the LSM level-0 shape); [[flushL0]] /
    * [[compact]] re-bucket them later, amortized — the per-batch full-
    * content shuffle, the one memory-bandwidth-bound operation the scaling
    * bench's stage accounting blames, disappears from the ingest path
    * entirely. LWW idempotency keeps reads correct either way.
    *
    * @param fence   optional (queryId, epochId): skip as a no-op when the
    *                table has already committed this epoch (idempotent
    *                redelivery — reference's skip-if-populated rerun fence)
    * @param saltPartitions sub-splits per bucket for the shuffle-write of
    *                hot buckets (skew defusal, SURVEY.md §7.6)
    * @param aliases renamed-upstream-field fallback: old→new column names
    *                (reference tolerates `page_id` vs `pageid`,
    *                `modules/transformation.py:133-136`) — an incoming old
    *                name feeds the new column instead of spawning a phantom
    * @param extraSummary extra commit-summary entries, built AFTER the
    *                batch's files are staged (the write action has run) and
    *                passed the staged metas — the hook CdcStream uses to
    *                fold the epoch's lineage record into the SAME metadata
    *                swap as the data commit (one commit carries data, fence
    *                and lineage; a crash can no longer land between them)
    */
  /** @param skipIfEmpty when the staged batch turns out to hold ZERO rows,
    *                delete the staged files and commit nothing (applied =
    *                false). The SQL DML commands use this instead of an
    *                `isEmpty` probe before the merge: the probe executed the
    *                full source plan (joins included) a second time just to
    *                avoid an empty table version (r6 verdict #7 / advice) —
    *                with this flag the plan executes exactly once and the
    *                emptiness is read for free from the staged footer stats.
    *                Only honored on the deduped write path, where staged row
    *                counts are known exact. */
  def mergeBatch(
      table: LakeTable,
      batch: DataFrame,
      fence: Option[(String, Long)] = None,
      saltPartitions: Int = 4,
      dedupOnWrite: Boolean = true,
      l0Mode: Boolean = false,
      aliases: Map[String, String] = Map.empty,
      extraSummary: Seq[DataFileMeta] => Map[String, String] = _ => Map.empty,
      skipIfEmpty: Boolean = false
  ): CommitStats = {
    val t0 = System.nanoTime()
    val (queryId, epochId) = fence.getOrElse(("adhoc", -1L))
    if (fence.isDefined && table.fence(queryId) >= epochId) {
      return CommitStats(applied = false, epochId, table.snapshot.snapshotId, 0L, 0, 0L)
    }

    val snap = table.snapshot
    val nBuckets = snap.numBuckets

    // renamed-field fallback BEFORE evolution, so the old name can never
    // spawn a phantom column alongside the real one
    val renamed = aliases.foldLeft(batch) { case (df, (oldName, newName)) =>
      if (df.columns.contains(oldName) && !df.columns.contains(newName))
        df.withColumnRenamed(oldName, newName)
      else df
    }

    // additive / widening schema evolution driven by the incoming batch.
    // The table schema retains `op`: tombstones are stored (see
    // MergeEngine.apply scaladoc), filtered out by [[readState]].
    val schemaId = table.evolveSchema(renamed.schema)
    val tableSchema = table.schema

    // align to the evolved table schema (null-fill/cast for older producers)
    val aligned = renamed.select(tableSchema.fields.map { f =>
      (if (renamed.columns.contains(f.name)) col(f.name) else lit(null))
        .cast(f.dataType).as(f.name)
    }.toSeq: _*)

    // dedupOnWrite=false appends raw bucketed deltas without the
    // aggregation (cheaper for near-duplicate-free streams; LWW still
    // resolves identically at compaction/read — it is idempotent).
    // L0 files additionally carry a constant `_epoch` column (RLE — costs
    // ~nothing): flushL0's lineage backfill needs rows attributable to
    // their commit epoch, and lsn ranges can overlap across epochs under
    // out-of-order delivery. The column is NOT part of the table schema, so
    // every schema-reconciled read drops it; only the backfill scan opts in.
    val (deltas, kind) =
      if (l0Mode) (aligned.withColumn("_epoch", lit(epochId)), "l0")
      else if (dedupOnWrite)
        (lwwWriteShape(aligned, nBuckets, tableSchema.fieldNames.toSeq, saltPartitions), "delta")
      else
        (aligned
          .withColumn("bucket", bucketOf(col("repo"), nBuckets))
          .repartition(col("bucket"),
            pmod(xxhash64(col("path")), lit(saltPartitions.toLong))), "delta")

    val tStage = System.nanoTime()
    val staged = table.stage(deltas, schemaId, kind = kind, layoutBuckets = nBuckets)
    if (sys.env.contains("GRAFT_TRACE"))
      System.err.println(f"""{"trace":"stage","sec":${(System.nanoTime() - tStage) / 1e9}%.2f,"pre_sec":${(tStage - t0) / 1e9}%.2f,"files":${staged.size}}""")
    // deduped writes know the batch's distinct-key count for free from the
    // staged-file row counts; -1 in L0/raw modes. Recorded in the commit
    // summary so lineage healing after a crash between the data and metrics
    // commits can recover the exact value without re-deduplicating.
    val dk =
      if (!l0Mode && dedupOnWrite && staged.forall(_.rows >= 0L))
        staged.map(_.rows).sum
      else -1L
    if (skipIfEmpty && dk == 0L) {
      // the batch resolved to zero rows: reclaim the (empty) staged files,
      // commit no table version
      staged.map(f => java.nio.file.Paths.get(f.path).getParent).distinct
        .foreach(d => graft.util.Fs.rmTree(
          if (d.getFileName.toString.startsWith("bucket=")) d.getParent else d))
      return CommitStats(applied = false, epochId, table.snapshot.snapshotId,
        0L, 0, (System.nanoTime() - t0) / 1000000L, distinctKeys = 0L)
    }
    // append commit: metadata written = one manifest for THIS batch's files
    // (O(batch)); every prior manifest is reused by reference
    val committed = table.appendCommit(
      staged,
      fence = fence,
      schemaId = Some(schemaId),
      summary = Map(
        "operation" -> "merge-append",
        "mode" -> (if (l0Mode) "l0" else "bucketed"),
        "added-files" -> staged.size.toString,
        "distinct-keys" -> dk.toString
      ) ++ extraSummary(staged)
    )
    CommitStats(
      applied = true,
      epochId = epochId,
      snapshotId = committed.snapshotId,
      batchBytes = staged.map(_.bytes).sum,
      touchedBuckets = staged.map(_.bucket).distinct.size,
      wallMs = (System.nanoTime() - t0) / 1000000L,
      distinctKeys = dk
    )
  }

  /** Advance the replay low-watermark: the CALLER's guarantee that no event
    * ordered at or below `(commit, lsn)` — the full LWW ordering key — will
    * ever be (re)delivered to this table (e.g. the binlog retention
    * horizon, or the oldest restartable checkpoint). From the next
    * [[compact]] on, tombstones at or below it are physically purged — they
    * can no longer be needed to suppress an out-of-order resurrection, so
    * tombstone retention stops being unbounded. Monotone: an ordering key
    * at or below the current watermark is a no-op. */
  def setWatermark(table: LakeTable, commit: String, lsn: Long): Snapshot =
    table.commit { s =>
      val advance = s.watermarkCommit == null ||
        (commit > s.watermarkCommit) ||
        (commit == s.watermarkCommit && lsn > s.watermarkLsn)
      if (!advance) s
      else s.copy(
        watermarkCommit = commit,
        watermarkLsn = lsn,
        opKind = "metadata",
        summary = Map("operation" -> "advance-watermark",
          "watermark" -> s"$commit/$lsn"))
    }

  // ------------------------------------------------------ write-audit-publish
  // The Iceberg WAP pattern over the LWW merge: stage a batch through the
  // NORMAL write shape but commit nothing; audit the would-be state; then
  // publish atomically or abort. The staged files are invisible to every
  // reader (referenced by no snapshot) and pinned against gcOrphans /
  // expireSnapshots by a `metadata/wap-<id>.json` sidecar until resolved.

  /** Stage `batch` for write-audit-publish: schema evolution, LWW write
    * dedup, bucket exchange and footer stats all run exactly as in
    * [[mergeBatch]], but NO snapshot is committed. Returns the staged file
    * metas (row counts/bytes — the first audit facts, free). */
  def wapStage(table: LakeTable, batch: DataFrame, wapId: String,
      saltPartitions: Int = 4,
      aliases: Map[String, String] = Map.empty): Seq[DataFileMeta] = {
    val snap = table.snapshot
    val renamed = aliases.foldLeft(batch) { case (df, (oldName, newName)) =>
      if (df.columns.contains(oldName) && !df.columns.contains(newName))
        df.withColumnRenamed(oldName, newName)
      else df
    }
    val schemaId = table.evolveSchema(renamed.schema)
    val tableSchema = table.schema
    val aligned = renamed.select(tableSchema.fields.map { f =>
      (if (renamed.columns.contains(f.name)) col(f.name) else lit(null))
        .cast(f.dataType).as(f.name)
    }.toSeq: _*)
    val deltas = lwwWriteShape(aligned, snap.numBuckets,
      tableSchema.fieldNames.toSeq, saltPartitions)
    val staged = table.stage(deltas, schemaId, kind = "delta",
      layoutBuckets = snap.numBuckets)
    table.wapWrite(wapId, schemaId, staged)
    staged
  }

  /** Audit view: the resolved LIVE state as if `wapId` were published —
    * current files ∪ staged files through the same LWW resolution as
    * [[readState]]. Reads the staged data; commits nothing. */
  def wapView(table: LakeTable, wapId: String): DataFrame = {
    val (_, staged) = table.wapRead(wapId)
    MergeEngine.liveView(MergeEngine.dedupBatch(
      table.readSubset(table.files ++ staged)))
  }

  /** Publish: land the staged files in ONE atomic fenced append — the
    * same commit [[mergeBatch]] would have made, stamped with the wap id.
    * Publishing is the only moment readers see the batch; a concurrent
    * commit between stage and publish is safe (the merge is append-only
    * and LWW resolution is order-free). The sidecar is deleted after the
    * commit; a crash between the two leaves a published wap whose sidecar
    * merely pins already-referenced files until the next publish/abort. */
  def wapPublish(table: LakeTable, wapId: String,
      fence: Option[(String, Long)] = None): Snapshot = {
    val (schemaId, staged) = table.wapRead(wapId)
    val snap = table.appendCommit(staged, fence = fence,
      schemaId = Some(schemaId),
      summary = Map(
        "operation" -> "wap-publish",
        "wap-id" -> wapId,
        "added-files" -> staged.size.toString))
    table.wapDelete(wapId)
    snap
  }

  /** Abort: delete the staged files and the sidecar. Nothing was ever
    * visible, so there is nothing to roll back. */
  def wapAbort(table: LakeTable, wapId: String): Unit = {
    val (_, staged) = table.wapRead(wapId)
    table.wapDelete(wapId)
    staged.map(f => java.nio.file.Paths.get(f.path).getParent).distinct
      .foreach(d => graft.util.Fs.rmTree(
        if (d.getFileName.toString.startsWith("bucket=")) d.getParent else d))
  }

  /** Fold deltas into base files for the buckets whose delta count exceeds
    * `ifDeltasAtLeast` (0 = always compact everything). Bounded read
    * amplification: after compaction a bucket is one LWW-resolved base file
    * set again. Atomic: the new snapshot swaps in rewritten buckets only.
    *
    * With L0 files present, a FULL compaction (threshold 0) folds
    * base ∪ deltas ∪ L0 in the SAME single exchange — L0 rows are
    * re-bucketed in the pass that resolves them, never shuffled twice. A
    * thresholded compaction never touches L0 (an L0 file spans buckets and
    * can only be replaced whole); [[flushL0]] handles those. */
  def compact(table: LakeTable, ifDeltasAtLeast: Int = 0,
      backfillLineage: Option[LakeTable] = None): Boolean = {
    val snap = table.snapshot
    val allFiles = table.filesOf(snap)
    val hasL0 = allFiles.exists(_.kind == "l0")
    if (ifDeltasAtLeast <= 0 && hasL0) {
      // L0 rows may belong to ANY bucket: resolve every bucket + L0 at once
      val buckets = (0 until snap.numBuckets).toSet + LakeTable.L0Bucket
      val r = compactBuckets(table, snap, allFiles, buckets).compacted
      backfillLineage.foreach(m => CdcStream.backfillDistinctKeys(
        m, table, allFiles.filter(_.kind == "l0")))
      return r
    }
    val deltasPerBucket = allFiles.filter(_.kind == "delta")
      .groupBy(_.bucket).view.mapValues(_.size).toMap
    if (deltasPerBucket.isEmpty) return false
    val buckets =
      if (ifDeltasAtLeast <= 0) deltasPerBucket.keySet
      else deltasPerBucket.filter(_._2 >= ifDeltasAtLeast).keySet
    if (buckets.isEmpty) return false
    compactBuckets(table, snap, allFiles, buckets).compacted
  }

  /** Re-bucket accumulated L0 files into ordinary per-bucket delta files —
    * the amortized exchange the shuffle-free ingest path deferred. One
    * write-aligned LWW pass over the L0 files only (never the table);
    * atomic swap replaces exactly those files.
    *
    * Two triggers, either fires the flush:
    *  - `minFiles` L0 files piled up — the read-amplification bound (a
    *    resolved read opens at most that many bucket-spanning files);
    *  - `minBytes` accumulated L0 bytes (0 = disabled) — the amortization
    *    bound: flush cost is one exchange of the flushed BYTES, so a bytes
    *    trigger keeps the per-flush exchange near-constant-cost regardless
    *    of how batch sizes swing, where a pure file-count trigger flushes
    *    tiny volumes under small batches (per-flush job overhead dominates)
    *    and lets huge batches pile up gigabytes (memory-spiky flushes). */
  /** @param backfillLineage lineage sidecar to repair with EXACT per-epoch
    *        distinct-key counts (VERDICT r4 #5): L0 appends record
    *        distinct_keys = -1 (the hot path refuses a dedup pass); the
    *        flush is the amortized point where the dedup happens anyway, so
    *        one extra column-pruned aggregation over the flushed files
    *        (repo, path, _epoch — never content) recovers the exact counts
    *        and rewrites the affected sidecar rows. */
  def flushL0(table: LakeTable, minFiles: Int = 1, minBytes: Long = 0L,
      backfillLineage: Option[LakeTable] = None): Boolean = {
    val snap = table.snapshot
    val l0 = table.filesOf(snap).filter(_.kind == "l0")
    if (l0.isEmpty) return false
    val due = l0.size >= math.max(1, minFiles) ||
      (minBytes > 0L && l0.map(_.bytes).sum >= minBytes)
    if (!due) return false
    val merged = lwwWriteShape(table.readSubset(l0), snap.numBuckets,
      snap.schema.fieldNames.toSeq, saltPartitions = 4)
    val staged = table.stage(merged, snap.schemaId, kind = "delta",
      layoutBuckets = snap.numBuckets)
    table.rewriteCommit(Set(LakeTable.L0Bucket), l0.map(_.path).toSet, staged,
      summary = Map(
        "operation" -> "flush-l0",
        "merged-files" -> l0.size.toString,
        "added-files" -> staged.size.toString))
    backfillLineage.foreach(m => CdcStream.backfillDistinctKeys(m, table, l0))
    true
  }

  /** Cost-based layout growth: evolve the bucket layout when the table has
    * outgrown it — mean data volume per bucket above `targetBucketBytes`
    * (total bytes / CURRENT numBuckets, layout-era-independent) doubles the
    * bucket count until the mean fits, capped at `maxBuckets`. The check is
    * manifest metadata already in memory (zero file IO, zero Spark jobs),
    * so an ingest loop can call it every epoch; the evolution itself is one
    * metadata commit ([[LakeTable.rebucket]] — no data rewritten). This is
    * what keeps a table created at 64 buckets correctly partitioned at
    * 1000× its initial size without an operator in the loop. Returns true
    * when a rebucket was committed. */
  def maybeRebucket(table: LakeTable, targetBucketBytes: Long,
      maxBuckets: Int = 4096): Boolean = {
    if (targetBucketBytes <= 0L) return false
    val snap = table.snapshot
    if (snap.numBuckets >= maxBuckets) return false
    // per-manifest byte totals from the snapshot itself — zero file IO
    // even on a cold handle (filesOf would read every manifest JSON)
    val bytes = snap.manifests.map(_.bytes).sum
    if (bytes / snap.numBuckets <= targetBucketBytes) return false
    var n = snap.numBuckets
    while (n < maxBuckets && bytes / n > targetBucketBytes) n *= 2
    // advisory, never stream-killing: a concurrent operator may have grown
    // the layout past our target between the read and the commit (growth-
    // only guard throws), or the commit may lose 10 optimistic retries to
    // a busy compactor — either way the right move is "not this epoch",
    // not an exception out of foreachBatch that kills the ingest query
    try { table.rebucket(math.min(n, maxBuckets)); true }
    catch {
      case e @ (_: IllegalArgumentException | _: IllegalStateException) =>
        System.err.println(s"[merge] auto-rebucket skipped: ${e.getMessage}")
        false
    }
  }

  /** Size-tiered compaction policy: a bucket is due when its accumulated
    * delta BYTES reach `sizeRatio` × its base bytes (so each rewrite at
    * least doubles the base at ratio 1.0 — a key's bytes are rewritten
    * O(log table) times over its lifetime, never O(batches)), or when its
    * delta FILE count reaches `maxDeltaFiles` (read-amplification cap for
    * buckets whose base dwarfs the incoming trickle). Replaces a flat
    * "every k deltas" trigger, under which a hot bucket's base is rewritten
    * every k batches — O(n²/k) total bytes over n batches. */
  /** Per-bucket compaction decision. [[Major]] folds base ∪ deltas into a
    * new base (the only point watermarked tombstones may be purged).
    * [[Minor]] merges the listed similar-sized delta FILES into one
    * consolidated delta without touching the base — tombstones are retained
    * unconditionally there (a delta tombstone may be shadowing a live base
    * row; dropping it would resurrect the row). LWW associativity makes the
    * pre-merge sound: LWW(base ∪ LWW(deltas)) = LWW(base ∪ deltas). */
  sealed trait CompactAction
  final case class Major() extends CompactAction
  final case class Minor(files: Seq[DataFileMeta]) extends CompactAction

  /** The pure policy of [[compactTiered]] — separated so its
    * rewrite-amplification bound can be property-tested by simulation over
    * 10^4 batches without running Spark jobs (CompactionPolicySpec).
    *
    * Major when delta bytes reach `sizeRatio` × base bytes (each major at
    * ratio 1.0 at least doubles the base → a byte is major-rewritten
    * O(log table/batch) times). Otherwise, when the bucket holds
    * `maxDeltaFiles` delta files (read-amplification trigger), a Minor
    * merge of the most-populated SIZE TIER (files within 2× of each other,
    * log2-bucketed): same-size merging is what makes consolidated deltas
    * grow geometrically, so a byte is minor-rewritten O(log) times between
    * majors — merging mixed sizes instead re-rewrites the biggest file
    * every cycle (measured 3× worse amplification at 10^4 batches even
    * with a smallest-half heuristic), and a flat every-k full rewrite is
    * O(batches) rewrites per byte, quadratic total. Pending delta files can
    * transiently exceed the trigger by the number of occupied tiers
    * (O(log), the standard LSM read-amplification tradeoff). */
  def tieredPlan(
      files: Seq[DataFileMeta],
      sizeRatio: Double = 1.0,
      maxDeltaFiles: Int = 16
  ): Map[Int, CompactAction] =
    files.groupBy(_.bucket).flatMap { case (b, fs) =>
      val deltas = fs.filter(_.kind == "delta")
      if (deltas.isEmpty) None
      else {
        val deltaBytes = deltas.map(_.bytes).sum
        val baseBytes = fs.filter(_.kind == "base").map(_.bytes).sum
        if (deltaBytes >= (sizeRatio * baseBytes).toLong) Some(b -> Major())
        else if (deltas.size >= maxDeltaFiles) {
          val byTier = deltas.groupBy(f =>
            63 - java.lang.Long.numberOfLeadingZeros(math.max(1L, f.bytes)))
          val (_, tierFiles) = byTier.maxBy { case (t, fs2) => (fs2.size, -t) }
          if (tierFiles.size >= 2) Some(b -> Minor(tierFiles)) else None
        } else None
      }
    }

  def compactTiered(
      table: LakeTable,
      sizeRatio: Double = 1.0,
      maxDeltaFiles: Int = 16
  ): CompactionStats = {
    val snap = table.snapshot
    val allFiles = table.filesOf(snap)
    val plan = tieredPlan(allFiles, sizeRatio, maxDeltaFiles)
    if (plan.isEmpty) return CompactionStats(compacted = false, 0, 0L)

    val majors = plan.collect { case (b, Major()) => b }.toSet
    val majorStats =
      if (majors.isEmpty) CompactionStats(compacted = false, 0, 0L)
      else compactBuckets(table, snap, allFiles, majors)

    val minorFiles = plan.values.collect { case Minor(fs) => fs }.flatten.toSeq
    val minorStats =
      if (minorFiles.isEmpty) CompactionStats(compacted = false, 0, 0L)
      else {
        // one job merges every minor bucket's selected deltas: LWW-dedup
        // within the selected files only, written back as ONE consolidated
        // delta per (bucket, salt) — same write-aligned single exchange
        val merged = lwwWriteShape(table.readSubset(minorFiles),
          snap.numBuckets, snap.schema.fieldNames.toSeq, saltPartitions = 4)
        val staged = table.stage(merged, snap.schemaId, kind = "delta",
          layoutBuckets = snap.numBuckets)
        table.rewriteCommit(
          minorFiles.map(_.bucket).toSet,
          minorFiles.map(_.path).toSet,
          staged,
          summary = Map(
            "operation" -> "compact-minor",
            "buckets" -> minorFiles.map(_.bucket).distinct.size.toString,
            "merged-files" -> minorFiles.size.toString))
        CompactionStats(compacted = true,
          minorFiles.map(_.bucket).distinct.size, staged.map(_.bytes).sum)
      }

    CompactionStats(
      compacted = majorStats.compacted || minorStats.compacted,
      buckets = majorStats.buckets + minorStats.buckets,
      bytesWritten = majorStats.bytesWritten + minorStats.bytesWritten)
  }

  /** Major-compact exactly `buckets` (current-layout ids) — the targeted
    * form [[compact]] drives; exposed for bucket-scoped maintenance and the
    * layout-evolution purge-guard tests. */
  def compactOnly(table: LakeTable, buckets: Set[Int]): CompactionStats = {
    val snap = table.snapshot
    compactBuckets(table, snap, table.filesOf(snap), buckets)
  }

  private def compactBuckets(
      table: LakeTable,
      snap: Snapshot,
      allFiles: Seq[DataFileMeta],
      buckets: Set[Int]
  ): CompactionStats = {
    // capture exactly which files this compaction resolves: the commit
    // carries forward any file a concurrent writer adds to these buckets
    // between this read and the commit (no silent loss under the
    // optimistic-retry model — see LakeTable.rewriteCommit)
    val readSet = allFiles.filter(f => buckets.contains(f.bucket)).map(_.path).toSet

    // same one-shuffle write-aligned trick as mergeBatch (salt by path so a
    // hot bucket still compacts across several tasks).
    // Tombstone purge: a tombstone whose (commit, lsn) is at or below the
    // table's replay low-watermark can never be needed again (no event
    // ordered at or below the watermark will ever arrive), so compaction
    // drops it — the only point tombstones may be physically removed
    // without risking resurrection. EXCEPT while unflushed L0 files sit
    // outside this compaction's resolution set: an L0 file can hold an
    // already-delivered OLDER row for a key this pass resolves (L0 files
    // span buckets, so per-bucket majors never read them); dropping the
    // tombstone here would resurrect that row at the next resolved read.
    // The purge simply waits for a pass that sees everything (full compact,
    // or any major after the L0 set has been flushed).
    //
    // The SAME hazard applies to bucket-layout evolution, in BOTH
    // directions: under mixed layouts a key's rows live under SEVERAL
    // bucket ids (one per era), so a key resolved by this pass can have an
    // already-delivered OLDER row in a file outside the set — an old-era
    // file whose id differs (key hashed elsewhere under that era), OR a
    // current-era file while the key entered this set via an old-era one
    // (round-5 review: purging the old-era tombstone would resurrect an
    // out-of-order older row parked in its current-era bucket). So while
    // the table holds ANY differently-laid-out file and this pass does not
    // see every bucketed file, tombstones are retained; compaction migrates
    // files to the current layout as it rewrites them, so the guard clears
    // itself (a full compact clears it immediately).
    val l0Outside = !buckets.contains(LakeTable.L0Bucket) &&
      allFiles.exists(_.kind == "l0")
    val bucketedOutside = allFiles.exists(f =>
      f.bucket != LakeTable.L0Bucket && !readSet.contains(f.path))
    val anyMixedLayout = allFiles.exists(f =>
      f.bucket != LakeTable.L0Bucket &&
        LakeTable.layoutOf(f, snap) != snap.numBuckets)
    val mixedLayoutHazard = anyMixedLayout && bucketedOutside
    val resolved = lwwWriteShape(table.readBuckets(buckets),
      snap.numBuckets, snap.schema.fieldNames.toSeq, saltPartitions = 4)
    val purged =
      if (snap.watermarkCommit == null || l0Outside || mixedLayoutHazard) resolved
      else resolved.where(!(col("op") === "D" &&
        (col("commit") < lit(snap.watermarkCommit) ||
          (col("commit") === lit(snap.watermarkCommit) &&
            col("lsn") <= lit(snap.watermarkLsn)))))
    val staged = table.stage(purged, snap.schemaId, kind = "base",
      layoutBuckets = snap.numBuckets)
    table.rewriteCommit(buckets, readSet, staged,
      summary = Map(
        "operation" -> "compact",
        "buckets" -> buckets.size.toString,
        "added-files" -> staged.size.toString))
    CompactionStats(compacted = true, buckets.size, staged.map(_.bytes).sum)
  }
}

/** What one compaction pass did — `bytesWritten` is the rewrite volume the
  * tiered policy exists to bound. */
final case class CompactionStats(compacted: Boolean, buckets: Int, bytesWritten: Long)
