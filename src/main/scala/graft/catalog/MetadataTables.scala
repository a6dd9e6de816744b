package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.meta.FileStats
import graft.tables.GraftTable

/** Metadata introspection tables — `SELECT * FROM cat.ns.t$files` /
  * `t$history` / `t$partitions` (the Iceberg/Delta metadata-table idiom;
  * the reference exposes the same information through its PG catalog and
  * `CALL` procedures — here it is ALSO queryable as plain SQL relations,
  * composable with joins/filters/aggregates).
  *
  * Rows are computed on the DRIVER from commit metadata at scan time
  * ([[LocalScan]]): no tasks, no file IO beyond the (cached) meta store —
  * introspecting a 100 TB table costs the same as a 100 MB one. */
object MetadataTables {

  val Suffixes = Seq("files", "history", "partitions")

  /** `name$suffix` -> (name, suffix) when the suffix is a metadata table. */
  def split(tableName: String): Option[(String, String)] = {
    val i = tableName.lastIndexOf('$')
    if (i <= 0) None
    else {
      val suffix = tableName.substring(i + 1)
      if (Suffixes.contains(suffix)) Some((tableName.substring(0, i), suffix))
      else None
    }
  }

  def forSuffix(t: GraftTable, ident: String, suffix: String): Table =
    suffix match {
      case "files" => filesTable(t, ident)
      case "history" => historyTable(t, ident)
      case "partitions" => partitionsTable(t, ident)
    }

  private def s(v: String): UTF8String = UTF8String.fromString(v)

  private def filesTable(t: GraftTable, ident: String): Table =
    new LocalRowsTable(ident, StructType(Seq(
      StructField("partition_desc", StringType),
      StructField("bucket_id", IntegerType),
      StructField("path", StringType),
      StructField("size_bytes", LongType),
      StructField("commit_ordinal", IntegerType),
      StructField("row_count", LongType),
      StructField("file_op", StringType),
      StructField("tombstone", BooleanType))),
      () => {
        // a real column named like the reserved row-count key shadows the
        // synthetic stats entry — its bounds are NOT a row count, so report
        // null (mirrors GraftScanV2's agg-pushdown refusal)
        val shadowed = rowCountShadowed(t)
        t.liveFiles.map { rf =>
          InternalRow(s(rf.partitionDesc), rf.file.bucketId, s(rf.file.path),
            rf.file.size, rf.commitOrdinal,
            if (shadowed) null
            else FileStats.rowCount(FileStats.decode(rf.file.stats)).map(Long.box).orNull,
            s(rf.file.fileOp),
            graft.meta.Tombstone.isTombstone(rf.file))
        }.toArray
      })

  private def rowCountShadowed(t: GraftTable): Boolean =
    t.schema.fieldNames.contains(FileStats.RowCountKey)

  private def historyTable(t: GraftTable, ident: String): Table =
    new LocalRowsTable(ident, StructType(Seq(
      StructField("version", IntegerType),
      StructField("timestamp_ms", LongType),
      StructField("commit_op", StringType),
      StructField("n_partitions", IntegerType),
      StructField("files_added", IntegerType))),
      () => t.history.map { case (v, ts, op, nParts, added) =>
        InternalRow(v, ts, s(op), nParts, added)
      }.toArray)

  private def partitionsTable(t: GraftTable, ident: String): Table =
    new LocalRowsTable(ident, StructType(Seq(
      StructField("partition_desc", StringType),
      StructField("version", IntegerType),
      StructField("n_files", IntegerType),
      StructField("n_runs", IntegerType),
      StructField("max_bucket_runs", IntegerType),
      StructField("total_bytes", LongType),
      StructField("row_count", LongType),
      StructField("last_commit_ms", LongType))),
      () => {
        val byDesc = t.liveFiles.groupBy(_.partitionDesc)
        val shadowed = rowCountShadowed(t)
        t.partitions.map { p =>
          val fs = byDesc.getOrElse(p.partitionDesc, Nil)
          val counts = fs.map(f => FileStats.rowCount(FileStats.decode(f.file.stats)))
          // run depth: n_runs = the partition's distinct commit ordinals;
          // max_bucket_runs = the deepest single bucket — the number a MOR
          // read task actually k-way-merges (and the compaction daemon's
          // prioritization key)
          val nRuns = fs.map(_.commitOrdinal).distinct.size
          val maxBucketRuns =
            if (fs.isEmpty) 0
            else fs.groupBy(_.file.bucketId).values
              .map(_.map(_.commitOrdinal).distinct.size).max
          InternalRow(s(p.partitionDesc), p.version, fs.size, nRuns,
            maxBucketRuns, fs.map(_.file.size).sum,
            if (shadowed || counts.exists(_.isEmpty)) null
            else Long.box(counts.flatten.sum),
            p.timestamp)
        }.toArray
      })
}

/** Read-only table whose rows materialize on the driver at scan-build time. */
private[catalog] class LocalRowsTable(
    ident: String,
    tableSchema: StructType,
    compute: () => Array[InternalRow]) extends Table with SupportsRead {

  override def name(): String = ident
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        private val data = compute()
        override def readSchema(): StructType = tableSchema
        override def rows(): Array[InternalRow] = data
        override def description(): String = s"GraftMetadataTable($ident)"
      }
    }
}
