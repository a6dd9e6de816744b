package graft.read

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.vectorized.{OnHeapColumnVector, WritableColumnVector}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch, ColumnarBatchRow}

/** COLUMNAR merge-on-read (the reference's batch-native merge,
  * rust/lakesoul-io/src/physical_plan/merge/sorted/sorted_stream_merger.rs):
  * the k-way merge emits whole `ColumnarBatch`es instead of rows, so a
  * merge-PENDING DSv2 scan stays on Spark's vectorized path end-to-end.
  *
  * Two emission modes, chosen per step:
  *   - PASS-THROUGH: when the winning run sits at the start of a batch whose
  *     LAST key is still below every other run's head, no other run (data or
  *     tombstone) holds any key in the batch's range — the reader's batch
  *     ships downstream ZERO-COPY with one key comparison for the whole
  *     batch. This is the overwhelming case for the MOR steady state (a
  *     compacted base + small deltas: base batches interleave with delta
  *     rows only at the delta keys). A tombstone run's wholly-unique batch
  *     is DROPPED the same way (all its keys are deleted).
  *   - BUILDER: overlap regions and partial batches fall to row-level steps;
  *     rows append into a reused OnHeapColumnVector builder batch (Spark's
  *     own RowToColumnConverter) flushed at 4096 rows or before the next
  *     pass-through.
  *
  * Output preserves (range, pk) order across both modes (pass-through fires
  * only strictly below the runner-up's head), so SupportsReportOrdering
  * stays valid. Reader-buffer lifecycle: a passed-through batch's vectors
  * are REUSED by its parquet reader on the next pull, so the winning run's
  * advance is deferred (`pendingAdjust`) until the caller has consumed the
  * batch — the same delayed-advance contract the row-path merge uses.
  *
  * Tombstone/operator semantics are IDENTICAL to the row path: grouped keys
  * fold through the shared [[GroupMerger]]. CDC-filtered scans never reach
  * this class (factory gates on cdcIdx < 0). */
final class BatchMergeIterator(
    runs: IndexedSeq[MergeRunCursor],
    keyIdx: Array[Int],
    keyTypes: Array[DataType],
    fields: Array[FieldMerge],
    schema: StructType) extends Iterator[ColumnarBatch] {

  private val nFields = schema.length
  private val k = runs.size
  private val keyComps = RowComp.makeComps(keyIdx, keyTypes)
  private def cmp(a: InternalRow, b: InternalRow): Int =
    RowComp.compare(keyComps, a, b)

  // ---- loser tree over cursor heads (same shape as KWayMergeIterator) ----
  private val loserTree = Array.fill(math.max(k, 1))(-1)

  private def cmpRun(x: Int, y: Int): Int = {
    if (x < 0) return if (y < 0) 0 else 1
    if (y < 0) return -1
    val hx = runs(x).head; val hy = runs(y).head
    if (hx == null) { if (hy == null) x - y else 1 }
    else if (hy == null) -1
    else {
      val c = cmp(hx, hy)
      if (c != 0) c else x - y
    }
  }

  private def adjust(run: Int): Unit = {
    var winner = run
    var parent = (run + k) >>> 1
    while (parent > 0) {
      if (cmpRun(loserTree(parent), winner) < 0) {
        val t = winner; winner = loserTree(parent); loserTree(parent) = t
      }
      parent >>>= 1
    }
    loserTree(0) = winner
  }

  private def runnerUp(run: Int): Int = {
    var best = -1
    var parent = (run + k) >>> 1
    while (parent > 0) {
      val cand = loserTree(parent)
      if (cand >= 0 && (best < 0 || cmpRun(cand, best) < 0)) best = cand
      parent >>>= 1
    }
    best
  }

  { if (k > 1) {
      val winner = new Array[Int](2 * k)
      var n = 2 * k - 1
      while (n >= k) { winner(n) = n - k; n -= 1 }
      n = k - 1
      while (n >= 1) {
        val a = winner(2 * n); val b = winner(2 * n + 1)
        if (cmpRun(a, b) <= 0) { winner(n) = a; loserTree(n) = b }
        else { winner(n) = b; loserTree(n) = a }
        n -= 1
      }
      loserTree(0) = winner(1)
    } else if (k == 1) loserTree(0) = 0 }

  // ---- output builder (reused across emissions) --------------------------
  private val BuilderCap = 4096
  private val converter =
    org.apache.spark.sql.execution.GraftExecShim.rowToColumnConverter(schema)
  private var builderVecs: Array[OnHeapColumnVector] = _
  private var builderBatch: ColumnarBatch = _
  private var builderRows = 0
  private var builderDirty = false // emitted, reset before next append

  private def appendRow(r: InternalRow): Unit = {
    if (builderVecs == null) {
      builderVecs = OnHeapColumnVector.allocateColumns(BuilderCap, schema)
      builderBatch = new ColumnarBatch(
        builderVecs.asInstanceOf[Array[ColumnVector]])
    } else if (builderDirty) {
      builderVecs.foreach(_.reset())
      builderDirty = false
    }
    converter(r, builderVecs.asInstanceOf[Array[WritableColumnVector]])
    builderRows += 1
  }

  private def flushBuilder(): ColumnarBatch = {
    builderBatch.setNumRows(builderRows)
    builderRows = 0
    builderDirty = true
    builderBatch
  }

  /** Run whose takeBatch() was emitted last call: its head (= the reader's
    * NEXT batch, overwriting the emitted one) must not be pulled until the
    * caller is done with the emitted batch — settle at the next call. */
  private var pendingAdjust = -1

  private var outReady: ColumnarBatch = _
  private val grouper = new GroupMerger(fields, nFields)

  override def hasNext: Boolean = {
    if (outReady == null) outReady = computeNext()
    outReady != null
  }

  override def next(): ColumnarBatch = {
    if (!hasNext) throw new NoSuchElementException
    val b = outReady
    outReady = null
    b
  }

  private def computeNext(): ColumnarBatch = {
    if (pendingAdjust >= 0) { adjust(pendingAdjust); pendingAdjust = -1 }
    while (true) {
      val w = loserTree(0)
      if (w < 0 || runs(w).head == null)
        return if (builderRows > 0) flushBuilder() else null
      val cw = runs(w)
      val ru = runnerUp(w)
      val ruHead = if (ru < 0) null else runs(ru).head
      if (cw.wholeBatch && (ruHead == null || cmp(cw.batchLast, ruHead) < 0)) {
        if (cw.tomb) { cw.dropBatch(); adjust(w) } // all keys deleted
        else if (builderRows > 0) return flushBuilder() // batch next call
        else { val b = cw.takeBatch(); pendingAdjust = w; return b }
      } else {
        val first = cw.head
        if (ruHead == null || cmp(first, ruHead) != 0) {
          // unique key: single holder
          if (!cw.tomb) {
            appendRow(first) // converter reads the view before the advance
            cw.advance(); adjust(w)
            if (builderRows == BuilderCap) return flushBuilder()
          } else { cw.advance(); adjust(w) }
        } else {
          // >=2 holders: fold oldest -> newest through the shared kernel
          grouper.start(first, cw.mask, cw.tomb)
          cw.advance(); adjust(w)
          var w2 = loserTree(0)
          while (w2 >= 0 && runs(w2).head != null &&
              cmp(runs(w2).head, grouper.keyRow) == 0) {
            grouper.add(runs(w2).head, runs(w2).mask, runs(w2).tomb)
            runs(w2).advance(); adjust(w2)
            w2 = loserTree(0)
          }
          val r = grouper.result()
          if (r != null) {
            appendRow(r)
            if (builderRows == BuilderCap) return flushBuilder()
          }
        }
      }
    }
    null // unreachable
  }
}

/** Cursor over one sorted run for the columnar merge. */
private[read] trait MergeRunCursor {
  def mask: Array[Boolean]
  def tomb: Boolean
  /** Current row view; null when the run is exhausted. */
  def head: InternalRow
  def advance(): Unit
  /** At the start of a batch that can ship wholesale (zero copy)? */
  def wholeBatch: Boolean
  /** Last row of the current batch (valid only when wholeBatch). */
  def batchLast: InternalRow
  /** Consume the whole current batch WITHOUT pulling the next one — the
    * reader reuses vectors, so the caller must finish with the returned
    * batch before touching this cursor's head again. */
  def takeBatch(): ColumnarBatch
  /** Skip the whole current batch (tombstone fast path). */
  def dropBatch(): Unit
}

/** Cursor over a vectorized parquet run (Iterator[ColumnarBatch]). Head and
  * batch-last are this cursor's OWN ColumnarBatchRow views, so comparing
  * heads across cursors (and head vs last within one) is safe — unlike
  * ColumnarBatch.getRow, which reuses one shared row. */
private[read] final class BatchRunCursor(
    batches: Iterator[ColumnarBatch],
    val mask: Array[Boolean],
    val tomb: Boolean) extends MergeRunCursor {

  private var cur: ColumnarBatch = _
  private var idx = 0
  private var headRow: ColumnarBatchRow = _
  private var lastRow: ColumnarBatchRow = _
  private var needPull = true

  private def pull(): Unit = {
    needPull = false
    while (batches.hasNext) {
      cur = batches.next()
      if (cur.numRows > 0) {
        idx = 0
        val cols = Array.tabulate[ColumnVector](cur.numCols)(cur.column)
        headRow = new ColumnarBatchRow(cols)
        lastRow = new ColumnarBatchRow(cols)
        headRow.rowId = 0
        lastRow.rowId = cur.numRows - 1
        return
      }
    }
    cur = null
  }

  override def head: InternalRow = {
    if (needPull) pull()
    if (cur == null) null else headRow
  }

  override def advance(): Unit = {
    idx += 1
    if (idx >= cur.numRows) { cur = null; needPull = true }
    else headRow.rowId = idx
  }

  override def wholeBatch: Boolean = {
    if (needPull) pull()
    cur != null && idx == 0
  }

  override def batchLast: InternalRow = lastRow

  override def takeBatch(): ColumnarBatch = {
    val b = cur
    cur = null
    needPull = true
    b
  }

  override def dropBatch(): Unit = { cur = null; needPull = true }
}

/** Cursor over a row stream (spill runs from [[BoundedMerge]]); never
  * offers batch pass-through. */
private[read] final class RowRunCursor(
    it: Iterator[InternalRow],
    val mask: Array[Boolean],
    val tomb: Boolean) extends MergeRunCursor {
  private var cur: InternalRow = if (it.hasNext) it.next() else null
  override def head: InternalRow = cur
  override def advance(): Unit = cur = if (it.hasNext) it.next() else null
  override def wholeBatch: Boolean = false
  override def batchLast: InternalRow = null
  override def takeBatch(): ColumnarBatch =
    throw new IllegalStateException("row run offers no batch")
  override def dropBatch(): Unit =
    throw new IllegalStateException("row run offers no batch")
}
