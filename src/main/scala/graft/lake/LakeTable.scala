package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One data file tracked by a snapshot. `bucket` = hash-bucket of `repo`
  * (the table's partition spec); parsed back from the written directory
  * layout `.../bucket=<b>/part-*.parquet`. `kind` is "base" (compacted) or
  * "delta" (merge-on-read append, resolved by LWW dedup at read time). */
final case class DataFileMeta(
    path: String,
    bucket: Int,
    bytes: Long,
    schemaId: Int,
    kind: String = "base"
)

/** A pinned, versioned schema (Spark DDL string). */
final case class SchemaInfo(id: Int, ddl: String)

/** An immutable table snapshot. The table state IS the latest committed
  * snapshot file; data files not referenced by it are invisible (staged or
  * orphaned), which is what makes the commit atomic — the same philosophy as
  * the reference's FILE_LOADS batch loads, where staged files become visible
  * only when the load job commits (reference `modules/transformation.py:84-97`,
  * `README.md:361-376` on orphaned temp tables after failures).
  *
  * `fences` maps a streaming queryId to the last committed epoch (batchId):
  * the engine's generalization of the reference's skip-if-populated rerun
  * fence (`data-pipeline.workflows.yaml:269-294`).
  */
final case class Snapshot(
    formatVersion: Int,
    version: Int,
    snapshotId: Long,
    parentSnapshotId: Long,
    schemaId: Int,
    schemas: Seq[SchemaInfo],
    numBuckets: Int,
    files: Seq[DataFileMeta],
    fences: Map[String, Long],
    summary: Map[String, String]
) {
  def schema: StructType = StructType.fromDDL(schemas.find(_.id == schemaId).get.ddl)
  def schemaById(id: Int): StructType = StructType.fromDDL(schemas.find(_.id == id).get.ddl)
}

/** From-scratch Iceberg-style snapshot table ("IceLake", SURVEY.md §7.0):
  * parquet data files + versioned JSON metadata, atomic commit by
  * hard-link-based check-and-swap, schema-id-versioned evolution with
  * widening reads, bucket partition pruning, epoch fencing.
  *
  * Layout:
  * {{{
  *   <root>/data/<commit-uuid>/bucket=<b>/part-*.parquet
  *   <root>/metadata/v<N>.metadata.json
  *   <root>/metadata/version-hint.text
  * }}}
  */
final class LakeTable private (val root: String, val spark: SparkSession) {
  import LakeTable._

  private val metaDir = Paths.get(root, "metadata")

  // ---------------------------------------------------------------- reads

  def currentVersion: Int = {
    val hint = metaDir.resolve("version-hint.text")
    val hinted =
      if (Files.exists(hint))
        try Files.readString(hint).trim.toInt
        catch { case NonFatal(_) => 0 }
      else 0
    // Hint is best-effort (written after the atomic swap); reconcile with a
    // listing so a crash between swap and hint-write can't lose a commit.
    var v = math.max(hinted, 1)
    while (Files.exists(metaDir.resolve(s"v${v + 1}.metadata.json"))) v += 1
    v
  }

  def snapshot: Snapshot = snapshotAt(currentVersion)

  def snapshotAt(version: Int): Snapshot = {
    val p = metaDir.resolve(s"v$version.metadata.json")
    val raw = mapper.readValue(Files.readString(p), classOf[Snapshot])
    // Jackson erases Map[String, Long] values to Integer for small numbers;
    // normalize so downstream Long-typed access doesn't hit unbox CCEs.
    val fixedFences = raw.fences.asInstanceOf[Map[String, Any]].map {
      case (k, v) => k -> v.asInstanceOf[Number].longValue()
    }
    raw.copy(fences = fixedFences)
  }

  def schema: StructType = snapshot.schema

  /** Last committed epoch for a streaming query, or -1. */
  def fence(queryId: String): Long = snapshot.fences.getOrElse(queryId, -1L)

  /** Read the full current state, reconciling every file group's pinned
    * schema to the current schema (missing columns → null, widening casts
    * int→long / float→double — SURVEY.md §7.5). */
  def read(): DataFrame = readFiles(snapshot, snapshot.files)

  /** Read only the given buckets (partition pruning via metadata — the scan
    * never touches files of unaffected buckets). */
  def readBuckets(buckets: Set[Int]): DataFrame =
    readFiles(snapshot, snapshot.files.filter(f => buckets.contains(f.bucket)))

  /** Time travel: read the table as of an older committed version. Data
    * files are immutable and referenced by each snapshot, so any version
    * that has not been GC'd reads back exactly. */
  def readVersion(version: Int): DataFrame = {
    val snap = snapshotAt(version)
    readFiles(snap, snap.files)
  }

  /** Roll back: commit a NEW snapshot restoring the file list, schema and
    * fences of `toVersion` (history is append-only — the rollback itself is
    * an auditable commit, like Iceberg's rollback). */
  def rollback(toVersion: Int): Snapshot = {
    val target = snapshotAt(toVersion)
    commit { _ =>
      target.copy(summary = Map(
        "operation" -> "rollback",
        "to-version" -> toVersion.toString))
    }
  }

  private def readFiles(snap: Snapshot, files: Seq[DataFileMeta]): DataFrame = {
    val target = snap.schema
    if (files.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], target)
    } else {
      files.groupBy(_.schemaId).map { case (sid, group) =>
        val fileSchema = snap.schemaById(sid)
        val df = spark.read.schema(fileSchema).parquet(group.map(_.path): _*)
        // reconcile by name with widening casts; unknown-to-target columns
        // are dropped (reference `ignoreUnknownValues`)
        val cols = target.fields.map { f =>
          if (fileSchema.fieldNames.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }
        df.select(cols.toSeq: _*)
      }.reduce(_ unionByName _)
    }
  }

  // --------------------------------------------------------------- writes

  /** Stage a DataFrame as new data files partitioned by `bucket` (the column
    * must exist and is not persisted into the files themselves — it becomes
    * the directory). Returns the staged files; they are INVISIBLE until a
    * subsequent [[commit]] references them. */
  def stage(df: DataFrame, schemaId: Int, kind: String = "base"): Seq[DataFileMeta] = {
    val commitUuid = UUID.randomUUID().toString
    val dir = Paths.get(root, "data", commitUuid)
    df.write.partitionBy("bucket").parquet(dir.toString)
    listParquet(dir, schemaId).map(_.copy(kind = kind))
  }

  private def listParquet(dir: Path, schemaId: Int): Seq[DataFileMeta] = {
    val out = Seq.newBuilder[DataFileMeta]
    Files.walk(dir).iterator().asScala.foreach { p =>
      val name = p.getFileName.toString
      if (name.endsWith(".parquet") && !name.startsWith(".") && !name.startsWith("_")) {
        val parent = p.getParent.getFileName.toString
        val bucket =
          if (parent.startsWith("bucket=")) parent.substring("bucket=".length).toInt else 0
        out += DataFileMeta(p.toString, bucket, Files.size(p), schemaId)
      }
    }
    out.result()
  }

  /** Optimistic, atomic commit: builds the next snapshot from the current
    * one and publishes it via hard-link creation (fails atomically if the
    * target version already exists → reload and retry). */
  def commit(build: Snapshot => Snapshot, maxRetries: Int = 10): Snapshot = {
    var attempt = 0
    while (true) {
      val cur = snapshot
      val built = build(cur)
      val next = built.copy(
        version = cur.version + 1,
        snapshotId = cur.snapshotId + 1,
        parentSnapshotId = cur.snapshotId
      )
      val tmp = metaDir.resolve(s".tmp-${UUID.randomUUID()}.json")
      Files.writeString(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsString(next))
      val target = metaDir.resolve(s"v${next.version}.metadata.json")
      try {
        Files.createLink(target, tmp) // atomic check-and-create
        Files.delete(tmp)
        writeHint(next.version)
        return next
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.delete(tmp)
          attempt += 1
          if (attempt > maxRetries)
            throw new IllegalStateException(s"commit contention: gave up after $maxRetries retries")
        // else loop: re-read current snapshot and rebuild
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def writeHint(v: Int): Unit = {
    val tmp = metaDir.resolve(s".hint-${UUID.randomUUID()}")
    Files.writeString(tmp, v.toString)
    Files.move(tmp, metaDir.resolve("version-hint.text"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Evolve the table schema to accommodate `incoming`: additive columns are
    * appended as nullable; int→long / float→double widenings upgrade the
    * column type; anything else must match. Returns the (possibly new)
    * schemaId to stamp on files written with the merged schema. Registers
    * the new schema via an atomic commit if it changed. */
  def evolveSchema(incoming: StructType): Int = {
    val cur = snapshot
    val merged = LakeTable.mergeSchemas(cur.schema, incoming)
    if (merged.toDDL == cur.schema.toDDL) cur.schemaId
    else {
      val committed = commit { s =>
        val mergedNow = LakeTable.mergeSchemas(s.schema, incoming)
        if (mergedNow.toDDL == s.schema.toDDL) s
        else {
          val nid = s.schemas.map(_.id).max + 1
          s.copy(
            schemas = s.schemas :+ SchemaInfo(nid, mergedNow.toDDL),
            schemaId = nid,
            summary = Map("operation" -> "evolve-schema")
          )
        }
      }
      committed.schemaId
    }
  }

  /** Delete staged/orphaned data directories referenced by NO retained
    * snapshot version (time travel over committed history stays intact;
    * only never-committed staging debris is collected — the reference's
    * beam_bq_job_LOAD temp-table cleanup, `README.md:361-376`). */
  def gcOrphans(): Int = {
    val referenced = (1 to currentVersion).flatMap { v =>
      snapshotAt(v).files.map(f =>
        Paths.get(f.path).getParent.getParent.getFileName.toString)
    }.toSet
    val dataDir = Paths.get(root, "data")
    if (!Files.exists(dataDir)) return 0
    var n = 0
    Files.list(dataDir).iterator().asScala.toList.foreach { d =>
      if (!referenced.contains(d.getFileName.toString)) {
        Files.walk(d).iterator().asScala.toList.reverse.foreach(Files.deleteIfExists(_))
        n += 1
      }
    }
    n
  }
}

object LakeTable {
  private[lake] val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  /** Widening-only schema merge (SURVEY.md §7.5). */
  def mergeSchemas(cur: StructType, incoming: StructType): StructType = {
    def widen(a: DataType, b: DataType): DataType = (a, b) match {
      case (x, y) if x == y => x
      case (IntegerType, LongType) | (LongType, IntegerType) => LongType
      case (ShortType, IntegerType) | (IntegerType, ShortType) => IntegerType
      case (ShortType, LongType) | (LongType, ShortType) => LongType
      case (FloatType, DoubleType) | (DoubleType, FloatType) => DoubleType
      case (x, y) =>
        throw new IllegalArgumentException(s"incompatible schema evolution: $x vs $y")
    }
    val curByName = cur.fields.map(f => f.name -> f).toMap
    val widened = cur.fields.map { f =>
      incoming.fields.find(_.name == f.name) match {
        case Some(in) => StructField(f.name, widen(f.dataType, in.dataType), nullable = true)
        case None => f
      }
    }
    val added = incoming.fields.filterNot(f => curByName.contains(f.name))
      .map(f => StructField(f.name, f.dataType, nullable = true))
    StructType(widened ++ added)
  }

  /** Create a new empty table (v1 snapshot). */
  def create(spark: SparkSession, root: String, schema: StructType, numBuckets: Int): LakeTable = {
    val metaDir = Paths.get(root, "metadata")
    Files.createDirectories(metaDir)
    val snap = Snapshot(
      formatVersion = 1,
      version = 1,
      snapshotId = 1L,
      parentSnapshotId = -1L,
      schemaId = 0,
      schemas = Seq(SchemaInfo(0, schema.toDDL)),
      numBuckets = numBuckets,
      files = Nil,
      fences = Map.empty,
      summary = Map("operation" -> "create")
    )
    val p = metaDir.resolve("v1.metadata.json")
    Files.writeString(p, mapper.writerWithDefaultPrettyPrinter().writeValueAsString(snap))
    val t = new LakeTable(root, spark)
    t.writeHint(1)
    t
  }

  def load(spark: SparkSession, root: String): LakeTable = {
    require(Files.exists(Paths.get(root, "metadata", "v1.metadata.json")),
      s"not a lake table: $root")
    new LakeTable(root, spark)
  }

  def exists(root: String): Boolean =
    Files.exists(Paths.get(root, "metadata", "v1.metadata.json"))
}
