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
  * match the query. Two match shapes:
  *
  *  - EXACT: query keys == view keys -> plain projection of view columns;
  *  - ROLLUP: query keys form a SUBSET of the view keys (including the
  *    empty set, a global aggregate) -> re-aggregate the view's partial
  *    rows (sum of sums, count as sum of counts, min of mins, max of
  *    maxes) — still O(view rows), never the source.
  *
  * The freshness gate: a view whose cursor lags the source's latest
  * commit is skipped, so results are always exact — a stale view costs
  * the rewrite, never correctness. Matching is deliberately conservative
  * (no DISTINCT, no FILTER clauses, bare-column grouping, filter-free
  * views; casts AROUND an aggregate are re-applied on top): a miss means
  * no rewrite, never a wrong answer. */
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

  /** The aggregate's input, split into an optional row filter and the
    * graft relation beneath it. */
  private def childParts(p: LogicalPlan)
      : (Option[Expression], Option[DataSourceV2Relation]) = p match {
    case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
      (Some(f.condition), relationOf(f.child))
    case other => (None, relationOf(other))
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (qFilter, relOpt) = childParts(agg.child)
    for {
      rel <- relOpt
      sourceTable = rel.table.asInstanceOf[GraftTableV2].table
      plan <- MaterializedView.rewriteCandidates(sourceTable.tablePath)
        .flatMap(vp => rewriteWith(agg, qFilter, rel, sourceTable, vp))
        .headOption
    } yield plan
  }

  private def rewriteWith(agg: Aggregate, qFilter: Option[Expression],
      rel: DataSourceV2Relation,
      source: GraftTable, viewPath: String): Option[LogicalPlan] = {
    val view = GraftTable.forPath(spark, viewPath)
    val p = view.info.properties
    // star-join views aggregate JOINED rows — they never answer a plain
    // source aggregate (an inner dim join changes row multiplicity)
    if (p.contains(MaterializedView.DimsProp)) return None
    // row filters must match semantically: a filtered view only answers
    // the identically-filtered query (and an unfiltered view only an
    // unfiltered one)
    p.get(MaterializedView.FilterProp) match {
      case None => if (qFilter.isDefined) return None
      case Some(f) =>
        val vf = resolveExpr(f, rel).getOrElse(return None)
        if (!qFilter.exists(_.semanticEquals(vf))) return None
    }
    // freshness gate: every source commit must already be folded in
    val latest = source.partitions.map(_.timestamp).maxOption.getOrElse(0L)
    if (p.get(MaterializedView.CursorProp).forall(_.toLong < latest)) return None
    val keys = MaterializedView.decodeKeys(p)
    val measures = MaterializedView.decodeMeasures(p)
    // group keys must be bare source columns
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference => a.name.toLowerCase
      case _ => return None
    }
    val keySet = keys.map(_.toLowerCase).toSet
    if (!groupNames.toSet.subsetOf(keySet)) return None
    val exact = groupNames.toSet == keySet

    val viewPlan = MaterializedView.read(spark, viewPath)
      .queryExecution.analyzed
    val viewAttr: Map[String, Attribute] =
      viewPlan.output.map(a => a.name.toLowerCase -> a).toMap

    // one rewritten output per aggregate output, or abort
    val outs = agg.aggregateExpressions.map { ne =>
      rewriteOutput(ne, rel, keys, measures, viewAttr, exact) match {
        case Some(e) => Alias(e, ne.name)(exprId = ne.exprId,
          qualifier = ne.qualifier)
        case None => return None
      }
    }
    logInfo(s"rewrote aggregate over ${source.tablePath} to mview $viewPath" +
      (if (exact) "" else " (rollup)"))
    if (exact) Some(Project(outs, viewPlan))
    else Some(Aggregate(
      groupNames.map(viewAttr), outs, viewPlan))
  }

  /** Rewrite one aggregate-output expression in terms of the view's
    * columns — exact mode projects, rollup mode re-aggregates. Casts
    * around an aggregate are re-applied on top of the rewritten form. */
  private def rewriteOutput(ne: NamedExpression, rel: DataSourceV2Relation,
      keys: Seq[String], measures: Seq[MaterializedView.Measure],
      viewAttr: Map[String, Attribute], exact: Boolean): Option[Expression] = {

    def rewriteAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      val (op, child) = ae.aggregateFunction match {
        case s: Sum => ("sum", s.child)
        case m: Min => ("min", m.child)
        case m: Max => ("max", m.child)
        case c: Count if c.children.length == 1 => ("count", c.children.head)
        case _ => return None
      }
      val m = measures.find(m => m.op == op &&
        resolveExpr(m.expr, rel).exists(_.semanticEquals(child)))
        .getOrElse(return None)
      val attr = viewAttr(m.name.toLowerCase)
      val folded: Expression =
        if (exact) attr
        else op match {
          case "sum" => Sum(attr).toAggregateExpression()
          case "count" =>
            // count rolls up as sum of counts; an empty view must yield
            // COUNT's 0, not SUM's NULL
            Coalesce(Seq(Sum(attr).toAggregateExpression(), Literal(0L)))
          case "min" => Min(attr).toAggregateExpression()
          case "max" => Max(attr).toAggregateExpression()
        }
      // rollup widening (e.g. sum over decimal) is cast back to the
      // query's result type; values cannot overflow it — they equal the
      // source-level aggregate the query would have produced
      if (folded.dataType == ae.dataType) Some(folded)
      else Some(Cast(folded, ae.dataType))
    }

    ne match {
      case a: AttributeReference if keys.exists(_.equalsIgnoreCase(a.name)) =>
        viewAttr.get(a.name.toLowerCase)
      case Alias(ae: AggregateExpression, _) => rewriteAgg(ae)
      case Alias(c @ Cast(ae: AggregateExpression, _, _, _), _) =>
        rewriteAgg(ae).map(e => c.copy(child = e))
      case _ => None
    }
  }

  /** Parse a view's measure/filter SQL and resolve it against the
    * relation THROUGH THE ANALYZER, so implicit casts and literal
    * promotions come out exactly as they do in the query being matched
    * (a name-only resolution would leave e.g. `v > 30` as double-vs-int
    * and never semanticEqual the query's coerced form). */
  private def resolveExpr(sql: String, rel: DataSourceV2Relation)
      : Option[Expression] =
    try {
      val parsed = spark.sessionState.sqlParser.parseExpression(sql)
      val probe = Project(Seq(Alias(parsed, "_mview_probe")()), rel)
      spark.sessionState.analyzer.execute(probe) match {
        case Project(Seq(a: Alias), _) if a.child.resolved => Some(a.child)
        case _ => None
      }
    } catch { case _: Exception => None }
}
