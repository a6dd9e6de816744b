package graft.tables

import java.util.concurrent.ThreadLocalRandom

import org.apache.spark.sql.{Column, DataFrame}

import graft.meta.{DataCommitInfo, MetaRerunException}

/** Multi-table ATOMIC writes (beyond-ref — neither the reference nor Delta
  * offers cross-table transactions; Iceberg only gained them with a REST
  * catalog). Made possible here by the same design move the reference uses
  * for multi-HOST arbitration: a single transactional catalog database
  * ([[graft.meta.JdbcMetaStore]]) arbitrates every table's commits, so N
  * tables' meta updates can share ONE database transaction.
  *
  * Protocol (the no-rename commit protocol, table-spanning): each op's
  * data files are written first — invisible to every reader until meta
  * publish — then `commitMany` lands all tables' version-log appends and
  * head CAS updates in one catalog transaction. A version conflict on ANY
  * table (concurrent writer) rolls back ALL tables and the batch retries
  * with jittered exponential backoff, re-staging ONLY the conflicted
  * table when the CAS error names one; a crash before the commit leaves
  * only orphan data files for vacuum. Readers therefore never observe
  * table A updated but table B not — the invariant that makes e.g. a fact
  * table and its summary table consumable without reconciliation logic.
  *
  * Beyond upserts, a transaction may stage any op with the
  * stage-then-publish shape: tombstone DELETEs and delta UPDATEs ride the
  * same commit (e.g. upsert today's facts into A while tombstoning the
  * superseded rows of B — the classic fact+rollup pipeline step).
  *
  * Scale: the data writes are ordinary per-table Spark jobs (cluster-wide,
  * no extra shuffle); the transaction itself touches O(partitions) catalog
  * rows, never data. */
/** One staged (written, not yet published) table entry of a multi-table
  * transaction: the commitMany entry plus the bucket count the delta files
  * were written under — the writer-side re-bucket CAS, same contract as
  * [[graft.meta.MetaStore.commit]]'s expectedBucketNum. */
private[tables] case class StagedEntry(
    tablePath: String,
    commits: Seq[DataCommitInfo],
    expected: Map[String, Int],
    writtenBucketNum: Option[Int])

object GraftTransaction {

  private val MaxAttempts = 8
  private val BackoffBaseMs = 20L
  private val BackoffCapMs = 1000L

  /** One staged operation of a multi-table transaction. Each op writes its
    * data files on `stage()` (invisible until publish) and returns its
    * [[graft.meta.MetaStore.commitMany]] entry. */
  sealed trait TxOp {
    def table: GraftTable
    private[tables] def stage(): StagedEntry
  }

  /** Delta upsert of `df` into a PK `table` (see [[GraftTable.upsert]]). */
  final case class TxUpsert(table: GraftTable, df: DataFrame) extends TxOp {
    private[tables] def stage() = table.stageUpsert(df)
  }

  /** Tombstone DELETE of `cond`'s matches (see
    * [[GraftTable.deleteTombstone]] for eligibility). */
  final case class TxDeleteTombstone(table: GraftTable, cond: Column)
      extends TxOp {
    private[tables] def stage() = table.stageDeleteTombstone(cond)
  }

  /** Delta UPDATE `set` over `cond`'s matches (see
    * [[GraftTable.updateDelta]] for eligibility). */
  final case class TxUpdateDelta(table: GraftTable, cond: Column,
      set: Map[String, Column]) extends TxOp {
    private[tables] def stage() = table.stageUpdateDelta(cond, set)
  }

  /** Upsert each batch into its PK table, all-or-nothing (the common case,
    * kept as sugar over [[run]]). */
  def upsertAll(targets: Seq[(GraftTable, DataFrame)]): Unit =
    run(targets.map { case (t, df) => TxUpsert(t, df) })

  /** Execute a mixed batch of staged ops as ONE atomic cross-table commit.
    * All tables must share one catalog, and multi-table atomicity requires
    * the JDBC catalog ([[graft.meta.MetaStore.commitMany]] refuses >1
    * table on the file store rather than pretend). Several ops may target
    * the same table: their commits merge into that table's entry and fold
    * sequentially (op order preserved within the table). On a CAS conflict
    * the commit retries with jittered exponential backoff; when the error
    * names the losing table only THAT table's ops re-stage — the other
    * tables' already-written files are reused, so contention on one table
    * does not multiply write IO across all of them. */
  def run(ops: Seq[TxOp]): Unit = {
    if (ops.isEmpty) return
    val store = ops.head.table.store
    require(ops.forall(_.table.store eq store),
      "multi-table transaction: all tables must share one catalog store")
    val byTable: Seq[(String, Seq[TxOp])] =
      ops.groupBy(_.table.tablePath).toSeq.sortBy(_._1)

    def stageTable(tableOps: Seq[TxOp]): StagedEntry = {
      val entries = tableOps.map(_.stage())
      val path = entries.head.tablePath
      // all ops staged against the same attempt-start snapshot: if a
      // concurrent writer moved a partition BETWEEN two stage() calls the
      // expected versions disagree — surface it as the CAS conflict it is
      // rather than committing a torn expectation
      val expected = entries.flatMap(_.expected)
      val merged = expected.groupBy(_._1).map { case (d, vs) =>
        if (vs.map(_._2).distinct.size > 1)
          throw new MetaRerunException(
            s"partition '$d' moved between stagings", Some(path))
        d -> vs.head._2
      }
      // a re-bucket between two stage() calls is the same torn state
      if (entries.map(_.writtenBucketNum).distinct.size > 1)
        throw new MetaRerunException(
          "table re-bucketed between stagings", Some(path))
      StagedEntry(path, entries.flatMap(_.commits), merged,
        entries.head.writtenBucketNum)
    }

    val staged = scala.collection.mutable.LinkedHashMap[String, StagedEntry]()
    var toStage = byTable // tables whose files need (re)writing this attempt
    var attempts = 0
    while (true) {
      try {
        toStage.foreach { case (p, tableOps) => staged(p) = stageTable(tableOps) }
        toStage = Nil
        val live = staged.values.filter(_.commits.nonEmpty).toSeq
        store.commitMany(
          live.map(e => (e.tablePath, e.commits, e.expected)),
          live.flatMap(e => e.writtenBucketNum.map(e.tablePath -> _)).toMap)
        return
      } catch {
        case e: MetaRerunException if attempts < MaxAttempts =>
          attempts += 1
          // jittered exponential backoff: N cluster writers retrying in
          // lockstep re-collide forever; full jitter spreads them out
          val cap = math.min(BackoffCapMs, BackoffBaseMs << (attempts - 1))
          Thread.sleep(ThreadLocalRandom.current().nextLong(cap + 1))
          toStage = e.conflictedTable
            .flatMap(tp => byTable.find(_._1 == tp))
            .map(Seq(_)).getOrElse(byTable) // unnamed conflict: all tables
          // Cross-table ping-pong guard: while this writer re-stages the
          // NAMED table, a concurrent writer may advance the others,
          // leaving their attempt-1 expectations stale — each retry then
          // fixes one table, trips on another, and the loop can exhaust
          // MaxAttempts without ever being wrong, just late. Pure-upsert
          // stagings are base-independent deltas (they commute with
          // interleaved commits, the same argument as publish-time
          // heads), so refresh their expectations to the CURRENT heads
          // without rewriting files; stagings holding update/delete ops
          // were computed FROM a snapshot and must re-stage instead.
          if (toStage.size < byTable.size) {
            val restaging = toStage.map(_._1).toSet
            val mustRestage = Seq.newBuilder[(String, Seq[TxOp])]
            byTable.filterNot { case (p, _) => restaging.contains(p) }
              .foreach { case (p, tableOps) =>
                if (tableOps.forall(_.isInstanceOf[TxUpsert]))
                  staged.get(p).foreach { e =>
                    staged(p) = e.copy(expected =
                      tableOps.head.table.refreshedExpectations(e.commits))
                  }
                else mustRestage += ((p, tableOps))
              }
            toStage = toStage ++ mustRestage.result()
          }
      }
    }
  }
}
