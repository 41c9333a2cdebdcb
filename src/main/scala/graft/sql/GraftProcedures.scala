package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._

import graft.cdc.LakeMerge
import graft.lake.LakeTable

/** SQL maintenance surface: the library's table-maintenance entry points as
  * catalog stored procedures (Spark 4 `ProcedureCatalog` / `CALL`):
  * {{{
  *   CALL graft.compact('ns.t')                  -- full LWW compaction (resolves L0)
  *   CALL graft.compact('ns.t', 4)               -- only if ≥4 deltas in a bucket
  *   CALL graft.flush_l0('ns.t')                 -- fold L0 files into their buckets
  *   CALL graft.expire_snapshots('ns.t', 10)     -- retain last 10, reclaim the rest
  *   CALL graft.gc_orphans('ns.t')               -- delete unreferenced staging files
  * }}}
  * Each returns its result facts as a one-row LocalScan (no Spark job for
  * the result itself). The table argument is catalog-relative
  * (`'ns.t'` under the catalog's root), matching how the tables are named
  * in SQL. */
object GraftProcedures {

  val names: Seq[String] =
    Seq("compact", "flush_l0", "expire_snapshots", "gc_orphans", "rollback",
      "tag", "drop_tag", "rebucket", "auto_rebucket", "add_files",
      "wap_publish", "wap_abort", "create_mart", "refresh_mart")

  def load(root: String, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().isEmpty || ident.namespace().sameElements(Array("system")),
      s"unknown procedure namespace: ${ident.namespace().mkString(".")}")
    ident.name().toLowerCase match {
      case "compact" => new CompactProcedure(root)
      case "flush_l0" => new FlushL0Procedure(root)
      case "expire_snapshots" => new ExpireProcedure(root)
      case "gc_orphans" => new GcProcedure(root)
      case "rollback" => new RollbackProcedure(root)
      case "tag" => new TagProcedure(root)
      case "drop_tag" => new DropTagProcedure(root)
      case "rebucket" => new RebucketProcedure(root)
      case "auto_rebucket" => new AutoRebucketProcedure(root)
      case "add_files" => new AddFilesProcedure(root)
      case "wap_publish" => new WapPublishProcedure(root)
      case "wap_abort" => new WapAbortProcedure(root)
      case "create_mart" => new CreateMartProcedure(root)
      case "refresh_mart" => new RefreshMartProcedure(root)
      case other =>
        throw new UnsupportedOperationException(
          s"no such procedure: $other (available: ${names.mkString(", ")})")
    }
  }

  private def lakeOf(root: String, tableArg: String): LakeTable = {
    // same segment validation as the catalog: a '..'/'/'-bearing procedure
    // arg must never resolve outside the warehouse root
    val path = GraftPaths.resolve(root, tableArg.split('.').toSeq)
    require(LakeTable.exists(path), s"not a lake table: $tableArg (resolved $path)")
    LakeTable.load(SparkSession.active, path)
  }

  private def utf8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)

  /** One-row result via [[GraftLocalScan]]. */
  private def result(schema: StructType, values: Any*): java.util.Iterator[Scan] =
    java.util.List.of[Scan](
      GraftLocalScan(schema, Array(new GenericInternalRow(values.toArray)))).iterator()

  private def tableParam = ProcedureParameter
    .in("table", StringType).comment("catalog-relative table name, e.g. 'ns.t'").build()

  /** Base: a procedure that is both unbound and bound (parameters are
    * static — bind only validates arity/coercion, which Spark drives off
    * `parameters()`). */
  private abstract class MaintenanceProcedure(root: String)
      extends UnboundProcedure with BoundProcedure {
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    protected def lake(input: InternalRow): LakeTable =
      lakeOf(root, input.getUTF8String(0).toString)
    protected def optInt(input: InternalRow, i: Int, default: Int): Int =
      if (input.numFields > i && !input.isNullAt(i)) input.getInt(i) else default
  }

  private val CompactSchema = StructType(Seq(
    StructField("compacted", BooleanType, nullable = false),
    StructField("version", IntegerType, nullable = false),
    StructField("data_files", IntegerType, nullable = false),
    StructField("delta_files", IntegerType, nullable = false)))

  private final class CompactProcedure(root: String) extends MaintenanceProcedure(root) {
    override def name(): String = "compact"
    override def description(): String =
      "LWW-compact a lake table (resolves deltas and L0 into per-bucket bases; " +
        "tombstones at/below the watermark are purged). if_deltas_at_least > 0 " +
        "compacts only buckets with at least that many deltas (minor, tiered)."
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("if_deltas_at_least", IntegerType).defaultValue("0").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = lake(input)
      val did = LakeMerge.compact(t, ifDeltasAtLeast = optInt(input, 1, 0))
      val snap = t.snapshot
      result(CompactSchema, did, snap.version, snap.fileCount, snap.deltaCount)
    }
  }

  private val FlushSchema = StructType(Seq(
    StructField("flushed", BooleanType, nullable = false),
    StructField("version", IntegerType, nullable = false)))

  private final class FlushL0Procedure(root: String) extends MaintenanceProcedure(root) {
    override def name(): String = "flush_l0"
    override def description(): String =
      "Fold unsorted L0 ingest files into their hash buckets (exact lineage backfill included)."
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("min_files", IntegerType).defaultValue("1").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val t = lake(input)
      val did = LakeMerge.flushL0(t, minFiles = optInt(input, 1, 1))
      result(FlushSchema, did, t.snapshot.version)
    }
  }

  private val ExpireSchema = StructType(Seq(
    StructField("expired_versions", IntegerType, nullable = false),
    StructField("manifests_deleted", IntegerType, nullable = false),
    StructField("data_files_deleted", IntegerType, nullable = false),
    StructField("bytes_reclaimed", LongType, nullable = false)))

  private final class ExpireProcedure(root: String) extends MaintenanceProcedure(root) {
    override def name(): String = "expire_snapshots"
    override def description(): String =
      "Expire history older than the last retain_last snapshots and reclaim " +
        "files only they referenced. Time travel below the new floor fails loudly."
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("retain_last", IntegerType).build(),
      ProcedureParameter.in("min_age_ms", LongType).defaultValue("0")
        .comment("spare unreferenced files younger than this — the " +
          "concurrent-writer guard; must exceed the longest stage→commit window")
        .build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val minAge =
        if (input.numFields > 2 && !input.isNullAt(2)) input.getLong(2) else 0L
      val r = lake(input).expireSnapshots(
        retainLast = optInt(input, 1, 2), minAgeMs = minAge)
      result(ExpireSchema, r.expiredVersions, r.manifestsDeleted,
        r.dataFilesDeleted, r.bytesReclaimed)
    }
  }

  private val GcSchema = StructType(Seq(
    StructField("files_deleted", IntegerType, nullable = false)))

  private val RollbackSchema = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false)))

  private final class RollbackProcedure(root: String) extends MaintenanceProcedure(root) {
    override def name(): String = "rollback"
    override def description(): String =
      "Roll the table back to a retained version (a NEW commit whose content " +
        "is the old snapshot — history stays append-only; changelog readers " +
        "crossing the rollback fail loudly and re-baseline)."
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("to_version", IntegerType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      require(input.numFields > 1 && !input.isNullAt(1), "to_version is required")
      val snap = lake(input).rollback(input.getInt(1))
      result(RollbackSchema, snap.version, snap.snapshotId)
    }
  }

  private val RebucketSchema = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("num_buckets", IntegerType, nullable = false),
    StructField("layouts", StringType, nullable = false)))

  private final class RebucketProcedure(root: String) extends MaintenanceProcedure(root) {
    override def name(): String = "rebucket"
    override def description(): String =
      "Grow the table's bucket layout (partition evolution): new writes " +
        "bucket under the new count; existing files are NOT rewritten — " +
        "point lookups probe every layout era, compaction migrates files " +
        "to the current layout as it rewrites them."
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("num_buckets", IntegerType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      require(input.numFields > 1 && !input.isNullAt(1), "num_buckets is required")
      val snap = lake(input).rebucket(input.getInt(1))
      result(RebucketSchema, snap.version, snap.numBuckets,
        utf8(snap.layoutsList.mkString(",")))
    }
  }

  private val AutoRebucketSchema = StructType(Seq(
    StructField("rebucketed", BooleanType, nullable = false),
    StructField("num_buckets", IntegerType, nullable = false)))

  private final class AutoRebucketProcedure(root: String) extends MaintenanceProcedure(root) {
    override def name(): String = "auto_rebucket"
    override def description(): String =
      "Grow the bucket layout iff mean data volume per bucket exceeds " +
        "target_bytes (doubling until it fits, capped at max_buckets; " +
        "metadata-only check, one metadata commit). No-op below the target."
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("target_bytes", LongType).build(),
      ProcedureParameter.in("max_buckets", IntegerType).defaultValue("4096").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      require(input.numFields > 1 && !input.isNullAt(1), "target_bytes is required")
      val t = lake(input)
      val did = LakeMerge.maybeRebucket(t, input.getLong(1),
        optInt(input, 2, 4096))
      result(AutoRebucketSchema, did, t.snapshot.numBuckets)
    }
  }

  private val TagSchema = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("version", IntegerType, nullable = false)))

  private final class TagProcedure(root: String) extends MaintenanceProcedure(root) {
    override def name(): String = "tag"
    override def description(): String =
      "Tag a retained snapshot with a name (default: current version). " +
        "Readable as VERSION AS OF '<name>'; the oldest tag pins the " +
        "retention floor against expire_snapshots. Re-tagging re-points."
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("name", StringType).build(),
      ProcedureParameter.in("version", IntegerType).defaultValue("-1").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      require(input.numFields > 1 && !input.isNullAt(1), "name is required")
      val tagName = input.getUTF8String(1).toString
      val v = lake(input).setTag(tagName, optInt(input, 2, -1))
      result(TagSchema, utf8(tagName), v)
    }
  }

  private val DropTagSchema = StructType(Seq(
    StructField("dropped", BooleanType, nullable = false)))

  private final class DropTagProcedure(root: String) extends MaintenanceProcedure(root) {
    override def name(): String = "drop_tag"
    override def description(): String =
      "Remove a named tag; its pinned history becomes expirable again."
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("name", StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      require(input.numFields > 1 && !input.isNullAt(1), "name is required")
      result(DropTagSchema, lake(input).deleteTag(input.getUTF8String(1).toString))
    }
  }

  private final class GcProcedure(root: String) extends MaintenanceProcedure(root) {
    override def name(): String = "gc_orphans"
    override def description(): String =
      "Delete staged files no retained snapshot references (crash leftovers)."
    override def parameters(): Array[ProcedureParameter] = Array(tableParam)
    override def call(input: InternalRow): java.util.Iterator[Scan] =
      result(GcSchema, lake(input).gcOrphans())
  }

  private val WapPublishSchema = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("published_files", IntegerType, nullable = false)))

  private final class WapPublishProcedure(root: String) extends MaintenanceProcedure(root) {
    override def name(): String = "wap_publish"
    override def description(): String =
      "Atomically publish a write-audit-publish staging set (see " +
        "LakeMerge.wapStage): the staged files land in one append commit " +
        "stamped with the wap id — the first moment readers see them."
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("wap_id", StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      require(input.numFields > 1 && !input.isNullAt(1), "wap_id is required")
      val snap = LakeMerge.wapPublish(lake(input), input.getUTF8String(1).toString)
      result(WapPublishSchema, snap.version,
        snap.summary.getOrElse("added-files", "0").toInt)
    }
  }

  private val WapAbortSchema = StructType(Seq(
    StructField("aborted", BooleanType, nullable = false)))

  private final class WapAbortProcedure(root: String) extends MaintenanceProcedure(root) {
    override def name(): String = "wap_abort"
    override def description(): String =
      "Discard a write-audit-publish staging set: staged files and sidecar " +
        "deleted; nothing was ever visible."
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("wap_id", StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      require(input.numFields > 1 && !input.isNullAt(1), "wap_id is required")
      LakeMerge.wapAbort(lake(input), input.getUTF8String(1).toString)
      result(WapAbortSchema, true)
    }
  }

  // --------------------------------------- incremental materialized views
  // A mart definition lives in the mart table's snapshot properties
  // (mart.def.<qid>.{source,sql,groups,schema}) so refreshes need nothing
  // but the catalog. The SQL text references the source's resolved live
  // state as the view name `source`; refresh routes through Mart.catchUp —
  // changelog-driven incremental recompute of ONLY affected groups, with
  // the cost-based fallback to a full re-baseline, exactly one fenced
  // commit either way. Typed read-back: `SELECT … FROM graft.ns.m.view_<qid>`.

  private[sql] def martAggregate(
      spark: SparkSession, sqlText: String): org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
    (src: org.apache.spark.sql.DataFrame) => {
      src.createOrReplaceTempView("source")
      spark.sql(sqlText)
    }

  private def defKey(qid: String, field: String) = s"mart.def.$qid.$field"

  private val CreateMartSchema = StructType(Seq(
    StructField("mart_version", IntegerType, nullable = false),
    StructField("source_version", IntegerType, nullable = false),
    StructField("result_schema", StringType, nullable = false)))

  private final class CreateMartProcedure(root: String) extends MaintenanceProcedure(root) {
    override def name(): String = "create_mart"
    override def description(): String =
      "Create an incrementally-maintained materialized view: `query` (SQL " +
        "over the view name `source` = the source table's resolved live " +
        "state) is published into a mart table and kept fresh by CALL " +
        "graft.refresh_mart — changelog-driven, only affected groups " +
        "recomputed. Read it typed via SELECT … FROM graft.<mart>.view_<id>."
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("source", StringType).comment("source table, e.g. 'ns.t'").build(),
      ProcedureParameter.in("mart", StringType).comment("mart table to create, e.g. 'ns.m'").build(),
      ProcedureParameter.in("query_id", StringType).build(),
      ProcedureParameter.in("query", StringType)
        .comment("GROUP BY SQL over the view name `source`").build(),
      ProcedureParameter.in("group_cols", StringType)
        .comment("comma-separated grouping columns of the query's output").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val src = lake(input)
      val martName = input.getUTF8String(1).toString
      val qid = input.getUTF8String(2).toString
      require(qid.matches("[A-Za-z0-9_-]+"), s"invalid query_id: $qid")
      val sqlText = input.getUTF8String(3).toString
      val groups = input.getUTF8String(4).toString.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      require(groups.nonEmpty, "group_cols must name at least one column")
      val martPath = GraftPaths.resolve(root, martName.split('.').toSeq)
      val mart = graft.cdc.Mart.martTable(spark, martPath)
      require(!mart.snapshot.properties.contains(defKey(qid, "sql")),
        s"mart query '$qid' already defined on $martName")
      // resolve the result schema NOW (plan only, nothing runs): validates
      // the SQL and that every group column is in the output
      val resultSchema = martAggregate(spark, sqlText)(LakeMerge.readState(src)).schema
      val missing = groups.filterNot(resultSchema.fieldNames.contains)
      require(missing.isEmpty,
        s"group_cols not in query output: ${missing.mkString(", ")} " +
          s"(output: ${resultSchema.fieldNames.mkString(", ")})")
      val srcName = input.getUTF8String(0).toString
      mart.commit(s => s.copy(
        properties = s.properties ++ Map(
          defKey(qid, "source") -> srcName,
          defKey(qid, "sql") -> sqlText,
          defKey(qid, "groups") -> groups.mkString(","),
          defKey(qid, "schema") -> resultSchema.toDDL),
        opKind = "metadata",
        summary = Map("operation" -> "create-mart", "query" -> qid)))
      // initial publish (full; later refreshes go incremental when cheap)
      graft.cdc.Mart.catchUp(mart, src, groups, martAggregate(spark, sqlText), qid)
      result(CreateMartSchema, mart.currentVersion, src.currentVersion,
        utf8(resultSchema.toDDL))
    }
  }

  private val RefreshMartSchema = StructType(Seq(
    StructField("refreshed", BooleanType, nullable = false),
    StructField("mart_version", IntegerType, nullable = false),
    StructField("source_version", IntegerType, nullable = false)))

  private final class RefreshMartProcedure(root: String) extends MaintenanceProcedure(root) {
    override def name(): String = "refresh_mart"
    override def description(): String =
      "Catch a materialized view up to its source's current version: " +
        "changelog-driven incremental recompute of affected groups, " +
        "cost-based re-baseline fallback, one fenced commit; no-op when " +
        "already current."
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("mart", StringType).build(),
      ProcedureParameter.in("query_id", StringType).build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val mart = lake(input)
      val qid = input.getUTF8String(1).toString
      val props = mart.snapshot.properties
      val sqlText = props.getOrElse(defKey(qid, "sql"),
        throw new IllegalArgumentException(
          s"no mart query '$qid' here (defined: ${martQueryIds(props).mkString(", ")})"))
      val src = lakeOf(root, props(defKey(qid, "source")))
      val groups = props(defKey(qid, "groups")).split(',').toSeq
      val stats = graft.cdc.Mart.catchUp(mart, src, groups,
        martAggregate(spark, sqlText), qid)
      result(RefreshMartSchema, stats.isDefined, mart.currentVersion,
        src.currentVersion)
    }
  }

  private[sql] def martQueryIds(props: Map[String, String]): Seq[String] =
    props.keys.collect {
      case k if k.startsWith("mart.def.") && k.endsWith(".sql") =>
        k.stripPrefix("mart.def.").stripSuffix(".sql")
    }.toSeq.sorted

  private val AddFilesSchema = StructType(Seq(
    StructField("added_files", IntegerType, nullable = false),
    StructField("added_bytes", LongType, nullable = false),
    StructField("version", IntegerType, nullable = false)))

  private final class AddFilesProcedure(root: String) extends MaintenanceProcedure(root) {
    override def name(): String = "add_files"
    override def description(): String =
      "Zero-copy import: register existing parquet files (a directory walked " +
        "recursively, or one file) as a lake table's L0 data — hard-linked into " +
        "the table, footer-lifted stats, ONE atomic commit, no data pages read. " +
        "Files must carry the full CDC envelope (repo, path, commit, lsn, op)."
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("source", StringType)
        .comment("directory (all *.parquet under it) or a single parquet file").build())
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      require(input.numFields > 1 && !input.isNullAt(1), "source is required")
      val t = lake(input)
      val src = input.getUTF8String(1).toString
      val p = java.nio.file.Paths.get(src)
      val files =
        if (java.nio.file.Files.isDirectory(p))
          graft.util.Fs.walk(p).filter { q =>
            val n = q.getFileName.toString
            n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_")
          }.map(_.toString).sorted
        else List(src)
      require(files.nonEmpty, s"add_files: no parquet files under $src")
      val snap = t.addFiles(files)
      result(AddFilesSchema, files.size,
        snap.summary.getOrElse("added-bytes", "0").toLong, snap.version)
    }
  }
}
