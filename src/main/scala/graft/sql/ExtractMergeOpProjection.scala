package graft.sql

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.NamedExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.GraftTableV2
import graft.functions.MergeOpMarker

/** Projection-embedded merge-operator selection (M4 SQL surface; reference
  * rules/ExtractMergeOperator.scala:20-88): rewrites
  *
  *   SELECT sum_all(v) AS v, ... FROM graft_cat.ns.t [WHERE ...]
  *
  * into a plain column projection over the graft relation with the packed
  * `graft.mergeops` scan option set, so the MOR read applies `sum_all`
  * across sorted runs for `v` — per QUERY, without touching table
  * properties (exactly the reference's scan-time extraction).
  *
  * Shape rules (same as the reference):
  *  - the marker's argument must reference exactly ONE column of the scan;
  *  - one column cannot carry two different operators in one query;
  *  - a marker over anything that is not a graft relation is an error
  *    (caught here when the relation is found to be foreign, and by
  *    [[GraftChecks]] for markers this rule never reached).
  */
case class ExtractMergeOpProjection(spark: SparkSession) extends Rule[LogicalPlan] {

  /** The packed option key: `col:op[,col:op...]` (values keep column-name
    * case; option KEYS are case-normalized by CaseInsensitiveStringMap,
    * which is why the spec lives in one value). */
  private val OptionKey = graft.read.ExtractMergeOpProjectionOption.Key

  private def hasMarker(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    e.exists(_.isInstanceOf[MergeOpMarker])

  /** Single-child descent to the graft DSv2 relation (the reference's
    * getLakeSoulRelation). */
  private def findRelation(p: LogicalPlan): Option[DataSourceV2Relation] = p match {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTableV2] => Some(r)
    case _ if p.children.length == 1 => findRelation(p.children.head)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    case p @ Project(list, child) if p.resolved && list.exists(hasMarker) =>
      val rel = findRelation(child).getOrElse(throw new IllegalArgumentException(
        "merge operators (graft_merge_op / registered operator functions) can " +
          "only be projected from a graft table scan"))
      val ops = mutable.LinkedHashMap[String, String]()
      val newList: Seq[NamedExpression] = list.map { ne =>
        ne.transformUp {
          case m: MergeOpMarker =>
            require(m.child.references.size == 1,
              s"merge operator '${m.opName}' must be applied to exactly one column")
            val colName = m.child.references.head.name
            ops.get(colName) match {
              case Some(prev) if prev != m.opName =>
                throw new IllegalArgumentException(
                  s"column '$colName' carries two merge operators in one query " +
                    s"('$prev' and '${m.opName}')")
              case _ => ops(colName) = m.opName
            }
            m.child
        }.asInstanceOf[NamedExpression]
      }
      val spec = ops.map { case (c, o) => s"$c:$o" }.mkString(",")
      val merged = new java.util.HashMap[String, String](rel.options)
      merged.put(OptionKey,
        Option(rel.options.get(OptionKey)).filter(_.nonEmpty)
          .map(prev => s"$prev,$spec").getOrElse(spec))
      val newRel = rel.copy(options = new CaseInsensitiveStringMap(merged))
      val newChild = child.transformUp {
        case r: DataSourceV2Relation if r eq rel => newRel
      }
      Project(newList, newChild)
  }
}
