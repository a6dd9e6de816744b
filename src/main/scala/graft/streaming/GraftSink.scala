package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.meta.{CommitOp, MetaStore}
import graft.tables.GraftTable
import graft.write.TransactionalWrite

/** Streaming sink semantics (SURVEY.md §2.1 S11; reference:
  * sources/LakeSoulSink.scala:18-89).
  *
  * Exactly-once: a batch is skipped when `batchId <= max committed batch id
  * for (table, queryId)` — the reference's StreamingRecord.getBatchId guard
  * (LakeSoulSink.scala:46-49). Output modes:
  *   - append:   plain append commit
  *   - complete: overwrite (expire all partitions, write new)
  *   - update:   upsert (PK tables only, LakeSoulDataSource.scala:56-61)
  *
  * Usable directly from Structured Streaming via
  * `df.writeStream.foreachBatch(GraftSink.forEachBatchWriter(table, queryId, mode))`.
  */
class GraftSink(
    table: GraftTable,
    queryId: String,
    outputMode: String = "append",
    store: MetaStore = MetaStore.default) extends Serializable {

  def addBatch(batchId: Long, df: DataFrame): Unit = {
    if (batchId <= store.getMaxBatchId(table.tablePath, queryId)) return // replayed
    outputMode match {
      case "append" => table.append(df)
      case "complete" => table.overwrite(df)
      case "update" =>
        require(table.info.hasPrimaryKey,
          "update output mode requires a primary-key table")
        table.upsert(df)
      case other => throw new IllegalArgumentException(s"unknown output mode $other")
    }
    store.recordBatchId(table.tablePath, queryId, batchId)
  }
}

object GraftSink {
  /** Adapter for `writeStream.foreachBatch`. */
  def forEachBatchWriter(table: GraftTable, queryId: String,
      outputMode: String = "append"): (DataFrame, Long) => Unit = {
    val sink = new GraftSink(table, queryId, outputMode)
    (df, batchId) => sink.addBatch(batchId, df)
  }
}
