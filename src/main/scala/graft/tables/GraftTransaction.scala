package graft.tables

import org.apache.spark.sql.DataFrame

import graft.meta.MetaRerunException

/** Multi-table ATOMIC writes (beyond-ref — neither the reference nor Delta
  * offers cross-table transactions; Iceberg only gained them with a REST
  * catalog). Made possible here by the same design move the reference uses
  * for multi-HOST arbitration: a single transactional catalog database
  * ([[graft.meta.JdbcMetaStore]]) arbitrates every table's commits, so N
  * tables' meta updates can share ONE database transaction.
  *
  * Protocol (the no-rename commit protocol, table-spanning): each table's
  * data files are written first — invisible to every reader until meta
  * publish — then `commitMany` lands all tables' version-log appends and
  * head CAS updates in one catalog transaction. A version conflict on ANY
  * table (concurrent writer) rolls back ALL tables and the whole batch
  * retries; a crash before the commit leaves only orphan data files for
  * vacuum. Readers therefore never observe table A updated but table B
  * not — the invariant that makes e.g. a fact table and its summary table
  * consumable without reconciliation logic.
  *
  * Scale: the data writes are ordinary per-table Spark jobs (cluster-wide,
  * no extra shuffle); the transaction itself touches O(partitions) catalog
  * rows, never data. */
object GraftTransaction {

  private val MaxAttempts = 8

  /** Upsert each batch into its PK table, all-or-nothing. All tables must
    * share one catalog, and multi-table atomicity requires the JDBC
    * catalog ([[graft.meta.MetaStore.commitMany]] refuses >1 table on the
    * file store rather than pretend). Batches are staged (files written,
    * nothing visible), then published in one catalog transaction; on a
    * CAS conflict the WHOLE set re-stages and retries. */
  def upsertAll(targets: Seq[(GraftTable, DataFrame)]): Unit = {
    if (targets.isEmpty) return
    val store = targets.head._1.store
    require(targets.forall(_._1.store eq store),
      "multi-table transaction: all tables must share one catalog store")
    require(targets.map(_._1.tablePath).distinct.size == targets.size,
      "multi-table transaction: same table twice (union its batches)")
    var attempts = 0
    while (true) {
      try {
        store.commitMany(targets.map { case (t, df) => t.stageUpsert(df) })
        return
      } catch {
        case _: MetaRerunException if attempts < MaxAttempts =>
          attempts += 1 // conflict on some table: re-stage everything
      }
    }
  }
}
