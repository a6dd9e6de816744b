package graft.catalog

import java.util.{Map => JMap, Set => JSet}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{AlwaysTrue, Filter, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.read.GraftScanBuilder
import graft.tables.GraftTable
import graft.util.Filters

/** DSv2 Table for graft (reference: catalog/LakeSoulTableV2.scala:91-225):
  * the SQL-surface handle behind `graft_cat.ns.t`. Reads go through
  * [[GraftScanBuilder]] (pushdown + KeyGroupedPartitioning); writes reuse the
  * transactional DSv1 write path via the V1Write fallback (INSERT INTO a PK
  * table upserts, matching `format("graft")`); DELETE WHERE is handled
  * metadata/command-side through [[GraftTable.delete]]. */
class GraftTableV2(spark: SparkSession, val table: GraftTable, ident: String)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  override def name(): String = ident

  override def schema(): StructType = table.schema

  override def partitioning(): Array[Transform] = {
    val ti = table.info
    val ranges = ti.rangeColumns.map(Expressions.identity)
    val bucket =
      if (ti.hasPrimaryKey) Seq(Expressions.bucket(ti.bucketNum, ti.hashColumns: _*))
      else Nil
    (ranges ++ bucket).toArray
  }

  override def properties(): JMap[String, String] = {
    val ti = table.info
    (ti.properties ++ Map(
      TableCatalog.PROP_PROVIDER -> "graft",
      TableCatalog.PROP_LOCATION -> ti.tablePath,
      "hashColumns" -> ti.hashColumns.mkString(","),
      "bucketNum" -> ti.bucketNum.toString)).asJava
  }

  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(spark, table, options.asScala.toMap)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsOverwrite {
      private var overwriteAll = false

      override def truncate(): WriteBuilder = { overwriteAll = true; this }

      override def overwrite(filters: Array[Filter]): WriteBuilder = {
        val full = filters.isEmpty || filters.forall(_.isInstanceOf[AlwaysTrue])
        if (!full) throw new UnsupportedOperationException(
          "graft supports INSERT OVERWRITE of the whole table only " +
            "(use DELETE + INSERT for filtered rewrites)")
        overwriteAll = true; this
      }

      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              if (overwriteAll || overwrite) table.overwrite(data)
              else if (table.info.hasPrimaryKey) table.upsert(data)
              else table.append(data)
            }
          }
      }
    }

  // DELETE FROM ... WHERE: runs as a metadata/rewrite command through the
  // table API (reference DeleteCommand.scala); only predicates we can
  // translate are accepted — Spark falls back to an analysis error otherwise.
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => Filters.toColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val cond = filters.flatMap(Filters.toColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    table.delete(cond)
  }
}
