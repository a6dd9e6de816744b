package graft.tools

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession

import graft.catalog.GraftCatalog
import graft.tables.{CompactionOptions, GraftTable}

/** Streaming compaction daemon (SURVEY.md §2.9 C8; reference:
  * compaction/CompactionTask.scala — a standalone service that watches
  * tables and compacts partitions as delta runs pile up).
  *
  * Spark-first shape: a driver-side daemon thread polls the warehouse
  * catalog (or an explicit table list) every `intervalMs` and triggers
  * [[GraftTable.compaction]] with a `fileNumLimit` trigger, so ONLY
  * partitions that accumulated more than `fileNumLimit` sorted runs are
  * rewritten — freshly-compacted partitions are untouched, exactly the
  * size-tiered policy a streaming ingest needs to keep MOR reads fast.
  * Compactions are CAS transactions, so the daemon can run alongside
  * writers (a lost race just retries).
  */
class CompactionDaemon(
    spark: SparkSession,
    tablePaths: () => Seq[String],
    intervalMs: Long = 60000L,
    fileNumLimit: Int = 5,
    tombstoneRunLimit: Int = 2,
    maxPartitionsPerSweep: Int = Int.MaxValue) {

  private val running = new AtomicBoolean(false)
  @volatile private var thread: Thread = _
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[CompactionDaemon])

  // Quiescent-table fast path — the poll-side analogue of the reference
  // daemon's PG LISTEN wakeup: remember each table's last-seen commit
  // timestamp and skip snapshot resolution entirely when nothing committed
  // since the previous sweep. A 10k-table warehouse then pays 10k O(heads)
  // reads per sweep plus full resolution ONLY for tables that changed.
  private val lastSeen = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  /** Tables skipped by the fast path in the most recent sweep (ops/test
    * introspection). */
  @volatile var lastSweepSkipped: Int = 0
  /** Tables that errored in the most recent sweep, with the error message
    * (ops/test introspection — a throwing table must be visible, not
    * silently absorbed). */
  @volatile var lastSweepErrors: Seq[(String, String)] = Nil

  /** One sweep over all tables; returns the table paths it compacted.
    * Two triggers, both per-partition:
    *  - more than `fileNumLimit` sorted runs (the size-tiered MOR-read
    *    trigger);
    *  - `tombstoneRunLimit`+ tombstone runs — a quiet partition (one big
    *    compacted run + a few tombstone deletes) never crosses the run
    *    limit, but its deleted rows must still be PHYSICALLY removed
    *    eventually (leveled compaction deliberately carries tombstones;
    *    only a full partition compaction materializes them).
    *
    * DEEPEST-FIRST: due partitions are ordered by their deepest bucket's
    * run count (the same `max_bucket_runs` that `t$partitions` surfaces —
    * the per-task k-way width a MOR read actually pays) and, when a sweep
    * budget is set (`maxPartitionsPerSweep`), only the worst offenders
    * compact this sweep. At reference scale a cadence daemon always has
    * more backlog than budget; spending it where run depth (and therefore
    * both read latency and task memory) is worst buys the most read-path
    * relief per compaction second. */
  def runOnce(): Seq[String] = {
    lastSweepSkipped = 0
    val errors = Seq.newBuilder[(String, String)]
    val out = tablePaths().flatMap { path =>
      try {
        val t = GraftTable.forPath(spark, path)
        val tsNow = t.lastCommitTs
        if (lastSeen.get(path) != null && lastSeen.get(path) == tsNow) {
          lastSweepSkipped += 1
          None
        } else compactIfDue(t, path, tsNow)
      } catch {
        // dropped tables and commit races are expected between listing and
        // resolution — skip the table this sweep, but keep it visible;
        // fatal errors (OOM, linkage) must propagate, never be absorbed
        case scala.util.control.NonFatal(e) =>
          errors += (path -> s"${e.getClass.getSimpleName}: ${e.getMessage}")
          None
      }
    }
    lastSweepErrors = errors.result()
    // a throwing table must be VISIBLE in ops output every sweep, not just
    // in the introspection field — at cluster scale silent skips compound
    // into unbounded run depth on exactly the tables that are broken
    if (lastSweepErrors.nonEmpty)
      log.warn("compaction sweep skipped {} erroring table(s): {}",
        lastSweepErrors.size,
        lastSweepErrors.map { case (p, m) => s"$p -> $m" }.mkString("; "): Any)
    out
  }

  private def compactIfDue(
      t: GraftTable, path: String, tsAtSweepStart: Long): Option[String] = {
        val byDesc = t.liveFiles.groupBy(_.partitionDesc)
        def bucketDepth(fs: Seq[graft.meta.ResolvedFile]): Int =
          if (fs.isEmpty) 0
          else fs.groupBy(_.file.bucketId).values
            .map(_.map(_.commitOrdinal).distinct.size).max
        val dueAll = byDesc.collect { case (desc, fs)
            if fs.map(_.commitOrdinal).distinct.size > fileNumLimit ||
              fs.filter(f => graft.meta.Tombstone.isTombstone(f.file))
                .map(_.commitOrdinal).distinct.size >= tombstoneRunLimit =>
          desc -> bucketDepth(fs)
        }.toSeq.sortBy { case (desc, depth) => (-depth, desc) }
        val due = dueAll.take(maxPartitionsPerSweep).map(_._1).toSet
        val rebucketed = t.autoRebucket().isDefined // no-op without the prop
        val acted =
          if (due.nonEmpty && !rebucketed) {
            t.compaction(CompactionOptions(), d => due.contains(d))
            true
          } else rebucketed
        // Fast-path bookkeeping. Record lastSeen ONLY for a quiet sweep
        // (nothing due, nothing rebucketed), and with the timestamp read at
        // sweep START — never a post-compaction re-read, which can absorb a
        // concurrent writer's commit and silently skip it next sweep. Any
        // sweep that acted, or that the budget truncated (due deeper than
        // maxPartitionsPerSweep, or a rebucket pre-empting compaction),
        // leaves the table armed so residual backlog keeps draining without
        // waiting for an external write to move the commit timestamp.
        if (!acted && dueAll.isEmpty) lastSeen.put(path, tsAtSweepStart)
        else lastSeen.remove(path)
        if (acted) Some(path) else None
  }

  def start(): Unit = if (running.compareAndSet(false, true)) {
    thread = new Thread(() => {
      try {
        while (running.get()) {
          // runOnce() already absorbs per-table NonFatal errors; this guard
          // covers throws from tablePaths() itself (catalog store hiccup) —
          // log and keep sweeping. Fatal errors (OOM, linkage) still exit,
          // but through the finally below so the daemon never dies with
          // `running` stuck true (which would make start() a permanent
          // no-op until an explicit stop()).
          try runOnce()
          catch {
            case scala.util.control.NonFatal(e) =>
              log.warn(s"compaction sweep failed (daemon continues): " +
                s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
          try Thread.sleep(intervalMs)
          catch { case _: InterruptedException => () }
        }
      } finally {
        if (running.compareAndSet(true, false))
          log.error("compaction daemon thread exited abnormally; " +
            "call start() to restart it")
      }
    }, "graft-compaction-daemon")
    thread.setDaemon(true)
    thread.start()
  }

  def stop(): Unit = if (running.compareAndSet(true, false)) {
    Option(thread).foreach(_.interrupt())
  }
}

object CompactionDaemon {
  /** Daemon over every table registered in the warehouse catalog. */
  def forWarehouse(spark: SparkSession, intervalMs: Long = 60000L,
      fileNumLimit: Int = 5): CompactionDaemon =
    new CompactionDaemon(spark,
      () => GraftCatalog.listAll(spark).values.toSeq, intervalMs, fileNumLimit)
}
