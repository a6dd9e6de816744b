package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command._

/** Guard rails for operations graft does not support (SURVEY.md §2.9 C16;
  * reference rules/LakeSoulUnsupportedOperationsCheck.scala:17-77): fail
  * ANALYSIS with a clear, actionable error instead of letting a v1 session-
  * catalog command half-apply to a graft table. The DSv2 surface has its own
  * guards (createPartition / replacePartitionMetadata / rename checks on
  * [[graft.catalog.GraftTableV2]] and [[graft.catalog.GraftCatalogV2]]);
  * this rule covers the v1 command corner where only a provider string or a
  * session-catalog identifier names the table. */
case class GraftUnsupportedOperationsCheck(spark: SparkSession)
    extends (LogicalPlan => Unit) {

  private def notSupported(op: String, hint: String = ""): Nothing =
    throw new UnsupportedOperationException(
      s"$op is not supported on graft tables" +
        (if (hint.nonEmpty) s" — $hint" else ""))

  private def isGraft(ti: TableIdentifier): Boolean =
    try {
      val c = spark.sessionState.catalog
      c.tableExists(ti) &&
        c.getTableMetadata(ti).provider.exists(_.equalsIgnoreCase("graft"))
    } catch { case _: Exception => false }

  private def isGraft(provider: String): Boolean =
    provider != null && provider.equalsIgnoreCase("graft")

  override def apply(plan: LogicalPlan): Unit = plan.foreach {
    case c: CreateTableLikeCommand if isGraft(c.sourceTable) =>
      notSupported("CREATE TABLE LIKE",
        "use CREATE TABLE graft_cat.ns.t ... or CTAS")
    case a: AnalyzePartitionCommand if isGraft(a.tableIdent) =>
      notSupported("ANALYZE TABLE ... PARTITION")
    case a: AlterTableAddPartitionCommand if isGraft(a.tableName) =>
      notSupported("ALTER TABLE ADD PARTITION",
        "graft partitions are created implicitly on write")
    case a: AlterTableSerDePropertiesCommand if isGraft(a.tableName) =>
      notSupported("ALTER TABLE ... SET SERDEPROPERTIES")
    case l: LoadDataCommand if isGraft(l.table) =>
      notSupported("LOAD DATA", "INSERT INTO the table instead")
    case i: InsertIntoDataSourceDirCommand if isGraft(i.provider) =>
      notSupported("INSERT OVERWRITE DIRECTORY")
    case r: AlterTableRenameCommand if isGraft(r.oldName) =>
      notSupported("ALTER TABLE RENAME",
        "use ALTER TABLE graft_cat.ns.t RENAME TO through the graft catalog")
    // a merge-op marker ExtractMergeOpProjection did not strip means it was
    // used somewhere other than a SELECT list over a graft scan (reference
    // NonMergeOperatorUDFCheck, ExtractMergeOperator.scala:95-110)
    case p if p.expressions.exists(_.exists(
        _.isInstanceOf[graft.functions.MergeOpMarker])) =>
      notSupported("merge operator functions outside a SELECT over a graft table",
        "project graft_merge_op(col, 'op') (or a registered operator function) " +
          "directly in the SELECT list of a graft table scan")
    case _ => ()
  }
}
