package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit

import graft.catalog.GraftTableV2
import graft.tables.GraftTable

/** SQL DML statements on graft catalog tables (SURVEY.md §2.9; reference:
  * rules/PreprocessTableMergeInto.scala:17-92, commands/UpdateCommand.scala,
  * DeleteCommand.scala): a post-hoc resolution rule rewrites resolved
  * UPDATE / DELETE / MERGE INTO plans over a graft DSv2 relation into
  * eagerly-executed commands backed by the transactional table API — the
  * same "analyze into a command" shape the reference uses, instead of
  * Spark's heavyweight SupportsRowLevelOperations machinery.
  *
  * MERGE INTO supports the reference-parity shape
  *   WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *
  * with the ON condition equating the primary-key columns (exactly the
  * semantics of [[GraftTable.mergeInto]] / upsert).
  */
case class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def graftPath(plan: LogicalPlan): Option[String] = plan match {
    case r: DataSourceV2Relation => r.table match {
      case g: GraftTableV2 => Some(g.table.tablePath)
      case _ => None
    }
    case SubqueryAlias(_, child) => graftPath(child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u: UpdateTable if u.resolved && graftPath(u.table).isDefined =>
      GraftSqlUpdateCommand(graftPath(u.table).get,
        u.assignments.map { a =>
          val name = a.key match {
            case ar: AttributeReference => ar.name
            case other => throw new UnsupportedOperationException(
              s"UPDATE of nested field $other is not supported")
          }
          name -> a.value
        }, u.condition)

    case d: DeleteFromTable if d.resolved && graftPath(d.table).isDefined =>
      GraftSqlDeleteCommand(graftPath(d.table).get, Option(d.condition))

    case m: MergeIntoTable if m.resolved && graftPath(m.targetTable).isDefined =>
      validateMergeShape(m)
      GraftSqlMergeCommand(graftPath(m.targetTable).get, m.sourceTable)

    case _ => plan
  }

  private def validateMergeShape(m: MergeIntoTable): Unit = {
    // Spark's assignment alignment wraps the source attribute in Cast /
    // AssertNotNull when the source column is nullable (e.g. parquet-backed)
    // but the target PK column is not, or when types need widening — unwrap
    // before deciding whether the assignment is a plain column copy.
    @annotation.tailrec
    def unwrap(e: Expression): Expression = e match {
      case c: org.apache.spark.sql.catalyst.expressions.Cast => unwrap(c.child)
      case a: org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull =>
        unwrap(a.child)
      case a: org.apache.spark.sql.catalyst.expressions.Alias => unwrap(a.child)
      case other => other
    }
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
    val ok = m.matchedActions.forall(isUpdateAll) &&
      m.notMatchedActions.forall(isInsertAll) &&
      m.notMatchedBySourceActions.isEmpty &&
      m.matchedActions.nonEmpty && m.notMatchedActions.nonEmpty
    if (!ok) throw new UnsupportedOperationException(
      "graft MERGE INTO supports WHEN MATCHED THEN UPDATE SET * / " +
        "WHEN NOT MATCHED THEN INSERT * (upsert) only")
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
    assignments: Seq[(String, Expression)],
    condition: Option[Expression]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable.forPath(spark, path)
    t.update(condition.map(DmlExpr.toColumn).getOrElse(lit(true)),
      assignments.map { case (n, v) => n -> DmlExpr.toColumn(v) }.toMap)
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

case class GraftSqlMergeCommand(path: String, source: LogicalPlan)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.graft.StreamShim.ofRows(spark, source)
    GraftTable.forPath(spark, path).mergeInto(df)
    Nil
  }
}
