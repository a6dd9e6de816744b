package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, ExprId, Expression, GetStructField}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit

import graft.catalog.GraftTableV2
import graft.tables.{GraftTable, MergeMatchedClause, MergeNotMatchedClause}

/** SQL DML statements on graft catalog tables (SURVEY.md §2.9; reference:
  * rules/PreprocessTableMergeInto.scala:17-92, commands/UpdateCommand.scala,
  * DeleteCommand.scala): a post-hoc resolution rule rewrites resolved
  * UPDATE / DELETE / MERGE INTO plans over a graft DSv2 relation into
  * eagerly-executed commands backed by the transactional table API — the
  * same "analyze into a command" shape the reference uses, instead of
  * Spark's heavyweight SupportsRowLevelOperations machinery.
  *
  * MERGE INTO: the reference-parity upsert shape (unconditional
  * WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *) takes
  * the zero-read delta fast path ([[GraftTable.mergeInto]]); every other
  * resolvable shape — conditional clauses, explicit assignments, DELETE
  * actions, NOT MATCHED BY SOURCE — compiles to the tiered copy-on-write
  * [[GraftTable.mergeIntoClauses]]. The ON condition must equate the
  * primary-key columns in both cases.
  */
case class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def graftTableV2(plan: LogicalPlan): Option[GraftTableV2] = plan match {
    case r: DataSourceV2Relation => r.table match {
      case g: GraftTableV2 => Some(g)
      case _ => None
    }
    case SubqueryAlias(_, child) => graftTableV2(child)
    case _ => None
  }

  private def graftPath(plan: LogicalPlan): Option[String] =
    graftTableV2(plan).map(_.table.tablePath)

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u: UpdateTable if u.resolved && graftPath(u.table).isDefined =>
      GraftSqlUpdateCommand(graftPath(u.table).get,
        u.assignments.map(a => assignPath(a.key) -> a.value), u.condition)

    case d: DeleteFromTable if d.resolved && graftPath(d.table).isDefined =>
      GraftSqlDeleteCommand(graftPath(d.table).get, Option(d.condition))

    // INSERT OVERWRITE under partitionOverwriteMode=dynamic: Spark demands a
    // native BatchWrite for OverwritePartitionsDynamic (the V1 write fallback
    // cannot express it), so the resolved plan is rewritten into the
    // transactional dynamic-overwrite command — same shape as UPDATE/DELETE.
    case o: OverwritePartitionsDynamic
        if o.query.resolved && graftPath(o.table).isDefined =>
      GraftSqlDynamicOverwriteCommand(graftPath(o.table).get, o.query)

    case m: MergeIntoTable if m.resolved && graftTableV2(m.targetTable).isDefined =>
      if (isUpsertShape(m))
        // reference-parity fast path: UPDATE SET * + INSERT * == delta upsert
        // (one shuffle+write, zero read)
        GraftSqlMergeCommand(graftPath(m.targetTable).get, m.sourceTable)
      else
        buildClausesCommand(graftTableV2(m.targetTable).get, m)

    case _ => plan
  }

  /** SET key → column path: a bare attribute is a top-level column, a
    * GetStructField chain (`SET s.a.b = ...`) is a nested struct path —
    * [[graft.tables.GraftTable.updatePaths]] rebuilds only the touched
    * leaf (reference UpdateExpressionsSupport.scala:39-108). Non-struct
    * extraction (array element / map key) stays unsupported, loudly. */
  private def assignPath(key: Expression): Seq[String] = key match {
    case ar: AttributeReference => Seq(ar.name)
    case g: GetStructField => assignPath(g.child) :+ g.extractFieldName
    case other => throw new UnsupportedOperationException(
      s"UPDATE of nested field $other is not supported (struct fields only)")
  }

  // Spark's assignment alignment wraps the source attribute in Cast /
  // AssertNotNull when the source column is nullable (e.g. parquet-backed)
  // but the target PK column is not, or when types need widening — unwrap
  // before deciding whether the assignment is a plain column copy.
  @annotation.tailrec
  private def unwrap(e: Expression): Expression = e match {
    case c: org.apache.spark.sql.catalyst.expressions.Cast => unwrap(c.child)
    case a: org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull =>
      unwrap(a.child)
    case a: org.apache.spark.sql.catalyst.expressions.Alias => unwrap(a.child)
    case other => other
  }

  private def isUpsertShape(m: MergeIntoTable): Boolean = {
    def assignsAllFromSource(assigns: Seq[Assignment]) = assigns.forall { a =>
      (a.key, unwrap(a.value)) match {
        case (k: AttributeReference, v: AttributeReference) => k.name == v.name
        case _ => false
      }
    }
    def isUpdateAll(a: MergeAction) = a match {
      case ua: UpdateAction =>
        ua.condition.isEmpty && assignsAllFromSource(ua.assignments)
      case _: UpdateStarAction => true
      case _ => false
    }
    def isInsertAll(a: MergeAction) = a match {
      case ia: InsertAction =>
        ia.condition.isEmpty && assignsAllFromSource(ia.assignments)
      case _: InsertStarAction => true
      case _ => false
    }
    m.matchedActions.forall(isUpdateAll) &&
      m.notMatchedActions.forall(isInsertAll) &&
      m.notMatchedBySourceActions.isEmpty &&
      m.matchedActions.nonEmpty && m.notMatchedActions.nonEmpty
  }

  /** General-shape MERGE (conditional clauses / explicit assignments /
    * DELETE / NOT MATCHED BY SOURCE) → [[GraftTable.mergeIntoClauses]].
    * Resolved target/source attributes are rewritten (by exprId) to
    * `_g_target.<col>` / `_g_source.<col>` unresolved references, which
    * re-resolve at run time against the aliased merge join frame. */
  private def buildClausesCommand(
      g: GraftTableV2, m: MergeIntoTable): GraftSqlMergeClausesCommand = {
    val tIds: Set[ExprId] = m.targetTable.output.map(_.exprId).toSet
    val sIds: Set[ExprId] = m.sourceTable.output.map(_.exprId).toSet
    val hashCols = g.table.info.hashColumns.toSet

    def qualify(e: Expression): Expression = e.transform {
      case a: AttributeReference if tIds.contains(a.exprId) =>
        UnresolvedAttribute(Seq("_g_target", a.name))
      case a: AttributeReference if sIds.contains(a.exprId) =>
        UnresolvedAttribute(Seq("_g_source", a.name))
    }

    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val onKeys: Map[String, String] = conjuncts(m.mergeCondition).map {
      case EqualTo(l, r) => (unwrap(l), unwrap(r)) match {
        case (a: AttributeReference, b: AttributeReference)
            if tIds(a.exprId) && sIds(b.exprId) && hashCols(a.name) => a.name -> b.name
        case (b: AttributeReference, a: AttributeReference)
            if tIds(a.exprId) && sIds(b.exprId) && hashCols(a.name) => a.name -> b.name
        case _ => throw new UnsupportedOperationException(
          "graft MERGE INTO ON condition must be a conjunction of " +
            "primary-key = source-column equalities")
      }
      case _ => throw new UnsupportedOperationException(
        "graft MERGE INTO ON condition must be a conjunction of " +
          "primary-key = source-column equalities")
    }.toMap

    // drop aligned self-assignments (SET c = c over the target side): Spark
    // aligns UPDATE assignments to the full schema, padding untouched columns
    // with no-op copies that would otherwise trip the PK-assignment guard
    def assigns(as: Seq[Assignment]): Seq[(String, Expression)] = as.flatMap { a =>
      // nested assignment (SET s.a = ...) → dotted clause key; GraftTable
      // rebuilds the touched leaf over the merge frame's target side
      val path = assignPath(a.key)
      val name = graft.tables.NestedUpdate.encodePath(path)
      unwrap(a.value) match {
        case ar: AttributeReference
            if path.size == 1 && tIds(ar.exprId) && ar.name == path.head => None
        case _ => Some(name -> qualify(a.value))
      }
    }

    def starSet: Seq[(String, Expression)] = {
      val srcByName = m.sourceTable.output.map(a => a.name -> a).toMap
      g.table.schema.fieldNames.toSeq.collect {
        case c if srcByName.contains(c) && !hashCols(c) =>
          c -> (UnresolvedAttribute(Seq("_g_source", c)): Expression)
      }
    }
    def starValues: Seq[(String, Expression)] = {
      val srcByName = m.sourceTable.output.map(a => a.name -> a).toMap
      g.table.schema.fieldNames.toSeq.collect {
        case c if srcByName.contains(c) =>
          c -> (UnresolvedAttribute(Seq("_g_source", c)): Expression)
      }
    }

    val matched = m.matchedActions.map {
      case UpdateAction(cond, as, _) => (cond.map(qualify), Some(assigns(as)))
      case _: UpdateStarAction => (None: Option[Expression], Some(starSet))
      case DeleteAction(cond) => (cond.map(qualify), None)
      case other => throw new UnsupportedOperationException(
        s"unsupported WHEN MATCHED action: $other")
    }
    val notMatched = m.notMatchedActions.map {
      case InsertAction(cond, as) => (cond.map(qualify), assigns(as))
      case _: InsertStarAction => (None: Option[Expression], starValues)
      case other => throw new UnsupportedOperationException(
        s"unsupported WHEN NOT MATCHED action: $other")
    }
    val nmbs = m.notMatchedBySourceActions.map {
      case UpdateAction(cond, as, _) => (cond.map(qualify), Some(assigns(as)))
      case DeleteAction(cond) => (cond.map(qualify), None)
      case other => throw new UnsupportedOperationException(
        s"unsupported WHEN NOT MATCHED BY SOURCE action: $other")
    }
    GraftSqlMergeClausesCommand(g.table.tablePath, m.sourceTable,
      onKeys, matched, notMatched, nmbs)
  }
}

/** Re-resolve expressions captured from the DML plan against a fresh table
  * read: resolved attribute ids belong to the statement's relation instance
  * and would not bind to `table.toDF`. */
private object DmlExpr {
  def toColumn(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.StreamShim.columnOf(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
}

case class GraftSqlUpdateCommand(
    path: String,
    assignments: Seq[(Seq[String], Expression)],
    condition: Option[Expression]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable.forPath(spark, path)
    t.updatePaths(condition.map(DmlExpr.toColumn).getOrElse(lit(true)),
      assignments.map { case (p, v) => p -> DmlExpr.toColumn(v) })
    Nil
  }
}

case class GraftSqlDeleteCommand(
    path: String,
    condition: Option[Expression]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable.forPath(spark, path)
    condition match {
      case Some(c) => t.delete(DmlExpr.toColumn(c))
      case None => t.delete()
    }
    Nil
  }
}

/** Dynamic partition overwrite: replace exactly the partitions present in
  * the query's rows ([[GraftTable.overwriteDynamic]]). The query arrives
  * by-position aligned to the table schema (ResolveInsertInto), so outputs
  * are renamed positionally before the write. */
case class GraftSqlDynamicOverwriteCommand(path: String, query: LogicalPlan)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable.forPath(spark, path)
    val df = org.apache.spark.sql.graft.StreamShim.ofRows(spark, query)
    val names = t.schema.fieldNames
    require(df.columns.length == names.length,
      s"INSERT OVERWRITE arity ${df.columns.length} != table ${names.length}")
    t.overwriteDynamic(df.toDF(names.toIndexedSeq: _*))
    Nil
  }
}

case class GraftSqlMergeCommand(path: String, source: LogicalPlan)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.graft.StreamShim.ofRows(spark, source)
    GraftTable.forPath(spark, path).mergeInto(df)
    Nil
  }
}

/** General-shape SQL MERGE INTO: clause expressions carry `_g_target.*` /
  * `_g_source.*` unresolved references produced by the rule and re-resolve
  * against the merge join frame built by
  * [[graft.tables.GraftTable.mergeIntoClauses]]. */
case class GraftSqlMergeClausesCommand(
    path: String,
    source: LogicalPlan,
    onKeys: Map[String, String],
    matched: Seq[(Option[Expression], Option[Seq[(String, Expression)]])],
    notMatched: Seq[(Option[Expression], Seq[(String, Expression)])],
    notMatchedBySource: Seq[(Option[Expression], Option[Seq[(String, Expression)]])])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    def colOf(e: Expression) = org.apache.spark.sql.graft.StreamShim.columnOf(e)
    def setOf(s: Seq[(String, Expression)]) = s.map { case (n, e) => n -> colOf(e) }.toMap
    val df = org.apache.spark.sql.graft.StreamShim.ofRows(spark, source)
    GraftTable.forPath(spark, path).mergeIntoClauses(df, onKeys,
      matched.map { case (c, s) => MergeMatchedClause(c.map(colOf), s.map(setOf)) },
      notMatched.map { case (c, v) => MergeNotMatchedClause(c.map(colOf), setOf(v)) },
      notMatchedBySource.map { case (c, s) => MergeMatchedClause(c.map(colOf), s.map(setOf)) })
    Nil
  }
}
