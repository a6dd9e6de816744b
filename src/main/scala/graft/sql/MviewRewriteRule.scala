package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.catalog.GraftTableV2
import graft.pipeline.MaterializedView
import graft.tables.GraftTable

/** Transparent materialized-view QUERY REWRITE (the Calcite/Hive MV-rewrite
  * idea, not in the reference): an aggregate over a graft catalog table is
  * answered from a registered, FRESH materialized view instead of the
  * source scan —
  *
  *   SELECT k, SUM(expr) FROM graft_cat.ns.src GROUP BY k
  *
  * becomes a scan of the view's pre-folded rows (O(groups) instead of
  * O(source)) whenever [[MaterializedView.enableRewrite]] registered a
  * view whose source, group keys, and measure expressions SEMANTICALLY
  * match the query. The freshness gate: a view whose cursor lags the
  * source's latest commit is skipped, so results are always exact — a
  * stale view costs the rewrite, never correctness.
  *
  * Matching scope (deliberately conservative — a miss means no rewrite,
  * never a wrong answer): ungrouped-filter-free aggregates of
  * sum/count/min/max (no DISTINCT, no FILTER clauses) whose grouping
  * expressions are bare source columns equal to the view's key set, over
  * views without a row filter. */
case class MviewRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!MaterializedView.rewriteEnabled) plan
    else plan.resolveOperatorsDown {
      case agg: Aggregate if agg.resolved =>
        tryRewrite(agg).getOrElse(agg)
    }

  private def relationOf(p: LogicalPlan): Option[DataSourceV2Relation] = p match {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTableV2] => Some(r)
    case a: SubqueryAlias => relationOf(a.child)
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = for {
    rel <- relationOf(agg.child)
    sourceTable = rel.table.asInstanceOf[GraftTableV2].table
    viewPath <- MaterializedView.rewriteCandidates(sourceTable.tablePath)
      .find(vp => matches(agg, rel, sourceTable, vp))
  } yield replace(agg, viewPath)

  private def matches(agg: Aggregate, rel: DataSourceV2Relation,
      source: GraftTable, viewPath: String): Boolean = {
    val view = GraftTable.forPath(spark, viewPath)
    val p = view.info.properties
    if (p.contains(MaterializedView.FilterProp)) return false
    // freshness gate: every source commit must already be folded in
    val latest = source.partitions.map(_.timestamp).maxOption.getOrElse(0L)
    if (p.get(MaterializedView.CursorProp).forall(_.toLong < latest)) return false
    val keys = MaterializedView.decodeKeys(p)
    val measures = MaterializedView.decodeMeasures(p)
    // group keys: bare columns, equal as a set to the view keys
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference => a.name
      case _ => return false
    }
    if (groupNames.map(_.toLowerCase).toSet != keys.map(_.toLowerCase).toSet)
      return false
    // every output must map to a view column (group key or measure)
    agg.aggregateExpressions.forall(ne => columnFor(ne, rel, keys, measures).isDefined)
  }

  /** The view column name answering `ne`, if any. */
  private def columnFor(ne: NamedExpression, rel: DataSourceV2Relation,
      keys: Seq[String], measures: Seq[MaterializedView.Measure])
      : Option[String] = ne match {
    case a: AttributeReference if keys.exists(_.equalsIgnoreCase(a.name)) =>
      Some(keys.find(_.equalsIgnoreCase(a.name)).get)
    case Alias(ae: AggregateExpression, _)
        if !ae.isDistinct && ae.filter.isEmpty =>
      val (op, child) = ae.aggregateFunction match {
        case s: Sum => ("sum", s.child)
        case m: Min => ("min", m.child)
        case m: Max => ("max", m.child)
        case c: Count if c.children.length == 1 => ("count", c.children.head)
        case _ => return None
      }
      measures.find(m => m.op == op &&
        resolveExpr(m.expr, rel).exists(_.semanticEquals(child)))
        .map(_.name)
    case _ => None
  }

  /** Parse a measure's SQL expr and resolve it against the relation's
    * output, so it can be compared semantically with the query's. */
  private def resolveExpr(sql: String, rel: DataSourceV2Relation)
      : Option[Expression] =
    try {
      val parsed = spark.sessionState.sqlParser.parseExpression(sql)
      var ok = true
      val resolved = parsed.transformUp {
        case u: UnresolvedAttribute =>
          rel.output.find(a =>
            spark.sessionState.conf.resolver(a.name, u.name)) match {
            case Some(a) => a
            case None => ok = false; u
          }
      }
      if (ok && resolved.resolved) Some(resolved) else None
    } catch { case _: Exception => None }

  /** The view scan projected to the aggregate's exact output attributes
    * (names AND exprIds preserved, so parents re-resolve nothing). */
  private def replace(agg: Aggregate, viewPath: String): LogicalPlan = {
    val rel2 = relationOf(agg.child).get
    val source = rel2.table.asInstanceOf[GraftTableV2].table
    val keys = MaterializedView.decodeKeys(
      GraftTable.forPath(spark, viewPath).info.properties)
    val measures = MaterializedView.decodeMeasures(
      GraftTable.forPath(spark, viewPath).info.properties)
    val viewPlan = MaterializedView.read(spark, viewPath)
      .queryExecution.analyzed
    val byName = viewPlan.output.map(a => a.name.toLowerCase -> a).toMap
    val projections = agg.aggregateExpressions.map { ne =>
      val col = columnFor(ne, rel2, keys, measures).get
      val attr = byName(col.toLowerCase)
      require(attr.dataType == ne.dataType,
        s"mview rewrite type mismatch for ${ne.name}: " +
          s"${attr.dataType} vs ${ne.dataType}")
      Alias(attr, ne.name)(exprId = ne.exprId, qualifier = ne.qualifier)
    }
    logInfo(s"rewrote aggregate over ${source.tablePath} to mview $viewPath")
    Project(projections, viewPlan)
  }
}
