package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeSet, Cast, EqualTo, Expression, In, Literal, Or}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, Filter, InsertAction, InsertIntoStatement, LogicalPlan, MergeIntoTable, Project, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.cdc.{LakeMerge, MergeEngine}

/** Analyzer rule that makes [[GraftTable]] relations executable: each
  * catalog/DataSource relation over a lake table is substituted with the
  * library's own resolved-live-state plan (`LakeMerge.readState` — LWW
  * winners over base ∪ deltas ∪ L0, tombstones dropped), aliased back to
  * the relation's output attribute ids. SQL therefore runs EXACTLY the
  * plan the Scala API runs — parquet filter pushdown, column pruning and
  * the single-exchange LWW shape all survive (PlanSpec gates them through
  * the SQL path).
  *
  * Point-lookup pruning: a top-level `repo = 'x'`, `repo IN (…)`, or
  * OR-of-equalities conjunct directly above the relation routes through
  * the per-key metadata read (`readForKey`/`readForKeys`) instead —
  * METADATA bucket + key-bloom pruning per key (a handful of files each,
  * plus unflushed L0) — with the original filter retained on top as the
  * residual. This is how the library's zero-job point-lookup contract
  * reaches SQL users, including multi-key lookups.
  */
class GraftTableResolution(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Unwrap SubqueryAlias chains down to a graft relation, if any. The
    * aliases only add qualifiers; references are already resolved by
    * exprId, so the substitution can drop them. */
  private def graftOf(p: LogicalPlan): Option[(DataSourceV2Relation, GraftTable)] = p match {
    case r: DataSourceV2Relation => r.table match {
      case t: GraftTable => Some((r, t))
      case _ => None
    }
    case SubqueryAlias(_, child) => graftOf(child)
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** A top-level point-lookup conjunct on `repo`, by exprId: a single
    * equality, an `IN`-list of literals, or an OR-tree of equalities all
    * yield the key set for metadata (bucket + bloom) pruning. */
  private def repoKeys(cond: Expression, repoAttr: Attribute): Option[Seq[String]] = {
    def eq(e: Expression): Option[String] = e match {
      case EqualTo(a: Attribute, Literal(v: UTF8String, StringType))
        if a.exprId == repoAttr.exprId => Some(v.toString)
      case EqualTo(Literal(v: UTF8String, StringType), a: Attribute)
        if a.exprId == repoAttr.exprId => Some(v.toString)
      case _ => None
    }
    def keysOf(e: Expression): Option[Seq[String]] = e match {
      case In(a: Attribute, vs) if a.exprId == repoAttr.exprId &&
          vs.forall { case Literal(_: UTF8String, StringType) => true; case _ => false } =>
        Some(vs.map { case Literal(v: UTF8String, StringType) => v.toString })
      case Or(l, r) => for { ls <- keysOf(l); rs <- keysOf(r) } yield ls ++ rs
      case other => eq(other).map(Seq(_))
    }
    conjuncts(cond).iterator.map(keysOf).collectFirst {
      case Some(ks) if ks.nonEmpty => ks.distinct
    }
  }

  private def substitute(
      r: DataSourceV2Relation, t: GraftTable, repo: Option[Seq[String]]): LogicalPlan = {
    val lake = t.lake(spark)
    // the WINDOW-shaped live view (not readState's max_by shape): SQL can
    // project any subset, and only the window form lets Catalyst prune
    // unreferenced payload columns down into the parquet scan — a
    // `SELECT repo FROM graft.t` must not read `content`
    val df = (t.asOfVersion, repo) match {
      case (None, Some(ks)) =>
        // metadata pruning for the point lookup (per-era hash bucket +
        // per-file key bloom, per key), then the prunable resolution over
        // only the files that can hold any of the keys
        import org.apache.spark.sql.functions.col
        MergeEngine.prunableLiveView(
          if (ks.sizeIs == 1) lake.readForKey(ks.head).where(col("repo") === ks.head)
          else lake.readForKeys(ks).where(col("repo").isin(ks: _*)))
      case (None, None) => MergeEngine.prunableLiveView(lake.read())
      case (Some(v), _) =>
        // versioned reads resolve the snapshot as-of; the repo residual
        // still pushes into the parquet scan, just without bucket pruning
        // (the pruning map is the CURRENT snapshot's layout)
        MergeEngine.prunableLiveView(lake.readVersion(v))
    }
    val resolved = df.queryExecution.analyzed
    require(resolved.output.length == r.output.length,
      s"graft table ${t.path}: schema drift between catalog relation " +
        s"(${r.output.length} cols) and resolved state (${resolved.output.length} cols)")
    Project(r.output.zip(resolved.output).map { case (out, in) =>
      Alias(in, out.name)(exprId = out.exprId)
    }, resolved)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // INSERT targets must STAY relations: `InsertIntoStatement` holds its
    // target as a child, and ResolveInsertInto needs the v2 relation there
    // to build AppendData — substituting the read plan under it would turn
    // the write target into a query. (AppendData itself holds the table
    // out-of-children, so only the pre-resolution statement needs this.)
    val writeTargets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case i: InsertIntoStatement =>
        graftOf(i.table).foreach { case (r, _) => writeTargets.add(r); () }
      case d: DeleteFromTable =>
        graftOf(d.table).foreach { case (r, _) => writeTargets.add(r); () }
      case u: UpdateTable =>
        graftOf(u.table).foreach { case (r, _) => writeTargets.add(r); () }
      case m: MergeIntoTable =>
        graftOf(m.targetTable).foreach { case (r, _) => writeTargets.add(r); () }
      case _ => ()
    }
    def readable(p: LogicalPlan): Option[(DataSourceV2Relation, GraftTable)] =
      graftOf(p).filterNot { case (r, _) => writeTargets.contains(r) }
    plan.resolveOperatorsDown {
      // canonical MERGE INTO forms → the library merge (see mergeRewrite)
      case m: MergeIntoTable if m.resolved && graftOf(m.targetTable).isDefined =>
        mergeRewrite(m).getOrElse(m)
      // UPDATE → re-emit matched winners as op='U' events (see updateRewrite)
      case u: UpdateTable if u.resolved && graftOf(u.table).isDefined =>
        updateRewrite(u).getOrElse(u)
      // Filter directly over the relation: route a repo point-lookup through
      // metadata pruning (matched top-down so this wins over the bare case)
      case f @ Filter(cond, child) if f.resolved && readable(child).isDefined =>
        val (r, t) = readable(child).get
        val repo = r.output.find(_.name == "repo").flatMap(a => repoKeys(cond, a))
        Filter(cond, substitute(r, t, repo))
      case p if readable(p).isDefined =>
        val (r, t) = readable(p).get
        substitute(r, t, None)
    }
  }

  // ----------------------------------------------------------- MERGE INTO
  // Graft tables don't implement row-level-operation planning (the LWW
  // merge IS the row-level operation); instead the two MERGE shapes whose
  // semantics the CDC merge expresses EXACTLY are rewritten to it:
  //   ON <all key cols equal>
  //   WHEN MATCHED THEN UPDATE SET *  WHEN NOT MATCHED THEN INSERT *
  //     → upsert every source row (GraftMergeUpsertCommand), and
  //   WHEN MATCHED THEN DELETE (nothing else)
  //     → tombstone target keys present in the source.
  // Anything else (partial SET lists, action conditions, not-matched-by-
  // source clauses, non-key ON) is NOT a plain LWW upsert/delete — left
  // unrewritten, so Spark fails it with its own unsupported-table error.

  /** `e` is column `name` of `from` (through resolution-inserted casts). */
  private def sameCol(e: Expression, name: String, from: AttributeSet): Boolean = e match {
    case a: Attribute => a.name == name && from.contains(a)
    case c: Cast => sameCol(c.child, name, from)
    case Alias(inner, _) => sameCol(inner, name, from)
    case _ => false
  }

  /** ON clause = conjunction of target.k == source.k over EXACTLY the merge
    * key columns. */
  private def keyEquiCondition(
      cond: Expression, tOut: AttributeSet, sOut: AttributeSet): Option[Map[String, Attribute]] = {
    val pairs = conjuncts(cond).map {
      case EqualTo(a: Attribute, b: Attribute)
        if tOut.contains(a) && sOut.contains(b) && a.name == b.name => Some(a.name -> b)
      case EqualTo(b: Attribute, a: Attribute)
        if tOut.contains(a) && sOut.contains(b) && a.name == b.name => Some(a.name -> b)
      case _ => None
    }
    val m = pairs.flatten.toMap
    if (pairs.forall(_.isDefined) && m.keySet == MergeEngine.keyCols.toSet) Some(m)
    else None
  }

  /** Assignments are the expanded `SET *` / `INSERT *`: every target column
    * assigned its same-named source column. */
  private def starAssignments(
      assigns: Seq[Assignment], targetOut: Seq[Attribute], sOut: AttributeSet): Boolean = {
    val byName = assigns.flatMap(a => a.key match {
      case k: Attribute => Some(k.name -> a.value)
      case _ => None
    }).toMap
    byName.size == assigns.size && targetOut.length == assigns.size &&
      targetOut.forall(t => byName.get(t.name).exists(sameCol(_, t.name, sOut)))
  }

  // -------------------------------------------------------------- UPDATE
  /** `UPDATE t SET <payload cols> WHERE cond` → [[GraftUpdateCommand]] over
    * the captured plan `Project(SET applied, Filter(cond, relation))`. The
    * relation resolves to the live state at RUN time (it is no longer under
    * a DML statement node in the captured plan), so the projection yields
    * each matched winner with the new payload and its original ordering.
    * Assignments to key/ordering/op columns are rejected loudly — changing
    * a key is a DELETE + INSERT, and the ordering is engine-fabricated. */
  private def updateRewrite(u: UpdateTable): Option[LogicalPlan] = {
    val (r, t) = graftOf(u.table).get
    if (t.asOfVersion.isDefined)
      throw new UnsupportedOperationException(
        "UPDATE on a versioned (AS OF) graft relation is not supported")
    val byName = u.assignments.flatMap(a => a.key match {
      case k: Attribute => Some(k.name -> a.value)
      case _ => None
    }).toMap
    if (byName.size != u.assignments.size) return None
    val protectedCols = (MergeEngine.keyCols ++ MergeEngine.orderCols :+ "op").toSet
    val hit = byName.keySet.intersect(protectedCols)
    if (hit.nonEmpty)
      throw new UnsupportedOperationException(
        s"UPDATE may not set ${hit.mkString(", ")}: key columns identify the " +
          "CDC entity (use DELETE + INSERT) and ordering/op are engine-fabricated")
    val proj = r.output.map { o =>
      byName.get(o.name) match {
        case Some(v) if v.dataType == o.dataType => Alias(v, o.name)()
        case Some(v) => Alias(Cast(v, o.dataType,
          Some(spark.sessionState.conf.sessionLocalTimeZone)), o.name)()
        case None => o
      }
    }
    Some(GraftUpdateCommand(t.path,
      Project(proj, u.condition.map(Filter(_, u.table)).getOrElse(u.table))))
  }

  private def mergeRewrite(m: MergeIntoTable): Option[LogicalPlan] = {
    val (r, t) = graftOf(m.targetTable).get
    if (t.asOfVersion.isDefined || m.notMatchedBySourceActions.nonEmpty) return None
    val sOut = m.sourceTable.outputSet
    keyEquiCondition(m.mergeCondition, AttributeSet(r.output), sOut).flatMap { keyAttrs =>
      (m.matchedActions, m.notMatchedActions) match {
        case (Seq(UpdateAction(None, up, _)), Seq(InsertAction(None, ins)))
            if starAssignments(up, r.output, sOut) && starAssignments(ins, r.output, sOut) =>
          val byName = ins.flatMap(a => a.key match {
            case k: Attribute => Some(k.name -> a.value)
            case _ => None
          }).toMap
          Some(GraftMergeUpsertCommand(t.path,
            Project(r.output.map(o => Alias(byName(o.name), o.name)()), m.sourceTable)))
        case (Seq(DeleteAction(None)), Seq()) =>
          Some(GraftMergeDeleteCommand(t.path,
            Project(MergeEngine.keyCols.map(k => Alias(keyAttrs(k), k)()), m.sourceTable)))
        case _ => None
      }
    }
  }
}

/** Runtime attachment for sessions that were built WITHOUT
  * `spark.sql.extensions=graft.GraftExtensions` (e.g. a shared session the
  * caller does not control, like the driver's). Spark fixes a session's
  * analyzer rules at sessionState construction, so this mutates the
  * session's (shared, mutable) `SparkSessionExtensions` and derives a NEW
  * session whose analyzer picks the rules up; catalog conf is set on the
  * derived session. The primary integration stays the builder config —
  * this is the escape hatch. */
object GraftSql {
  private val attached = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSessionExtensions, java.lang.Boolean]())

  def attach(spark: SparkSession, catalogName: String = "graft",
      root: Option[String] = None): SparkSession = {
    val ext = org.apache.spark.sql.graftshim.SessionBridge.extensionsOf(spark)
    attached.synchronized {
      if (!attached.containsKey(ext)) {
        new graft.GraftExtensions().apply(ext)
        attached.put(ext, java.lang.Boolean.TRUE)
      }
    }
    val s2 = spark.newSession()
    root.foreach { r =>
      s2.conf.set(s"spark.sql.catalog.$catalogName", classOf[GraftCatalog].getName)
      s2.conf.set(s"spark.sql.catalog.$catalogName.root", r)
    }
    s2
  }
}
