package graft.read

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.GraftExecShim
import org.apache.spark.sql.execution.vectorized.{OnHeapColumnVector, WritableColumnVector}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

import graft.tables.GraftTable

/** Direct unit coverage for the columnar k-way merge (BatchMergeIterator):
  * the overlap-region slice copier's edge cases — BuilderCap truncation
  * mid-stretch, tombstone stretches, a stretch ending exactly at a batch
  * boundary, all three decimal storage widths, and the non-copyable
  * fallback — each asserted EQUIVALENT to the row-path KWayMergeIterator
  * on the same logical input, plus the sliceCopiedRows gauge proving the
  * columnar copy actually ran (the assertion fails if someone silently
  * disables the fast path). */
class BatchMergeSuite extends graft.SparkFixture {

  // ---- harness ------------------------------------------------------------

  private def toBatch(schema: StructType, rows: Seq[InternalRow]): ColumnarBatch = {
    val vecs = OnHeapColumnVector.allocateColumns(math.max(rows.size, 1), schema)
    val conv = GraftExecShim.rowToColumnConverter(schema)
    rows.foreach(r => conv(r, vecs.asInstanceOf[Array[WritableColumnVector]]))
    val b = new ColumnarBatch(vecs.asInstanceOf[Array[ColumnVector]])
    b.setNumRows(rows.size)
    b
  }

  private def norm(v: Any): Any = v match {
    case u: UTF8String => u.toString
    case d: Decimal => d.toJavaBigDecimal
    case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toLongArray.toSeq
    case x => x
  }

  private def dumpRow(r: InternalRow, schema: StructType): Seq[Any] =
    schema.fields.indices.map { i =>
      if (r.isNullAt(i)) null else norm(r.get(i, schema(i).dataType))
    }

  /** Materialize the columnar merge output (copying rows out before the
    * next pull — builder and reader batches are reused). Also records the
    * size of every emitted batch. */
  private def dumpBatches(it: Iterator[ColumnarBatch], schema: StructType,
      sizes: ArrayBuffer[Int] = ArrayBuffer.empty): Seq[Seq[Any]] = {
    val out = ArrayBuffer.empty[Seq[Any]]
    while (it.hasNext) {
      val b = it.next()
      sizes += b.numRows()
      val rows = b.rowIterator()
      while (rows.hasNext) out += dumpRow(rows.next(), schema)
    }
    out.toSeq
  }

  private def useLastFields(schema: StructType): Array[FieldMerge] =
    schema.fields.zipWithIndex.map { case (f, i) => FieldMerge(i, f.dataType, 0, ",") }

  private def allMask(n: Int): Array[Boolean] = Array.fill(n)(true)

  /** Row-path reference on the same logical runs. */
  private def rowPath(schema: StructType, runs: Seq[Seq[InternalRow]],
      tombs: Seq[Boolean]): Seq[Seq[Any]] = {
    val keyIdx = Array(0)
    val keyTypes = Array(schema(0).dataType)
    val it = new KWayMergeIterator(
      runs.map(_.iterator).toIndexedSeq, keyIdx, keyTypes,
      useLastFields(schema), schema.length,
      Array.fill(runs.size)(allMask(schema.length)), tombs.toArray)
    it.map(r => dumpRow(r, schema)).toSeq
  }

  /** Columnar path: each run is one or more batches. */
  private def batchPath(schema: StructType, runs: Seq[Seq[Seq[InternalRow]]],
      tombs: Seq[Boolean], sizes: ArrayBuffer[Int] = ArrayBuffer.empty): Seq[Seq[Any]] = {
    val cursors = runs.zipWithIndex.map { case (batches, i) =>
      new BatchRunCursor(batches.map(b => toBatch(schema, b)).iterator,
        allMask(schema.length), tombs(i)): MergeRunCursor
    }.toIndexedSeq
    val it = new BatchMergeIterator(cursors, Array(0),
      Array(schema(0).dataType), useLastFields(schema), schema)
    dumpBatches(it, schema, sizes)
  }

  // ---- schemas ------------------------------------------------------------

  // every decimal storage width: int-backed (p<=9), long-backed (p<=18),
  // byte-array-backed (p>18) — the TPC-H-shaped case the copier exists for
  private val decSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType),
    StructField("d5", DecimalType(5, 2)), StructField("d12", DecimalType(12, 2)),
    StructField("d38", DecimalType(38, 10))))

  private def decRow(k: Long, tag: String): InternalRow = new GenericInternalRow(
    Array[Any](k, UTF8String.fromString(s"$tag$k"),
      if (k % 7 == 0) null else Decimal(BigDecimal(k % 900) + 0.25, 5, 2),
      if (k % 11 == 0) null else Decimal(BigDecimal(k) * 100 + 0.5, 12, 2),
      if (k % 13 == 0) null
      else Decimal(BigDecimal(s"123456789012345678901234567.${k % 100}"), 38, 10)))

  test("decimal slice copy: overlap stretches equal the row-path merge " +
    "across all three decimal widths, and the columnar copier ran") {
    // run0 (old): keys 0..999; run1 (new): every 10th key overwritten plus
    // fresh keys above — stretches of 9 unique rows between overlaps
    val base = (0L until 1000L).map(decRow(_, "a"))
    val delta = ((0L until 1000L by 10).map(decRow(_, "b")) ++
      (1000L until 1020L).map(decRow(_, "b"))).sortBy(_.getLong(0))

    val before = BatchMergeIterator.sliceCopiedRows.sum()
    val got = batchPath(decSchema,
      Seq(Seq(base.take(400), base.slice(400, 1000)), Seq(delta)),
      Seq(false, false))
    val want = rowPath(decSchema, Seq(base, delta), Seq(false, false))
    assert(got == want)
    assert(got.size == 1020)
    assert(BatchMergeIterator.sliceCopiedRows.sum() - before >= 800,
      "decimal schema must take the column-major slice path")
  }

  test("BuilderCap truncation mid-stretch: a >4096-row single-holder " +
    "stretch flushes at the cap and continues, order preserved") {
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    def row(k: Long, t: String) =
      new GenericInternalRow(Array[Any](k, UTF8String.fromString(s"$t$k")))
    // run0's batch ends ABOVE run1's last key, so pass-through is impossible
    // and the 10000-key stretch below 20000 must slice in cap-sized pieces
    val big = (1L to 10000L).map(row(_, "a")) :+ row(30000L, "a")
    val other = Seq(row(0L, "b"), row(20000L, "b"))

    val sizes = ArrayBuffer.empty[Int]
    val before = BatchMergeIterator.sliceCopiedRows.sum()
    val got = batchPath(schema, Seq(Seq(big), Seq(other)),
      Seq(false, false), sizes)
    val want = rowPath(schema, Seq(big, other), Seq(false, false))
    assert(got == want)
    assert(got.size == 10003)
    assert(got.map(_.head.asInstanceOf[Long]) == got.map(_.head.asInstanceOf[Long]).sorted)
    assert(sizes.forall(_ <= 4096), s"builder flushes must respect the cap: $sizes")
    assert(BatchMergeIterator.sliceCopiedRows.sum() - before >= 10000)
  }

  test("tombstone stretches: keys unique to a newer tombstone run are " +
    "skipped wholesale; overlapped keys die; later keys survive") {
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    def row(k: Long, t: String) =
      new GenericInternalRow(Array[Any](k, UTF8String.fromString(s"$t$k")))
    val data = (1L to 100L).map(row(_, "a")) ++ (301L to 320L).map(row(_, "a"))
    val tomb = (50L to 200L).map(row(_, "t")) // 50..100 kill data, 101..200 unique

    val got = batchPath(schema,
      Seq(Seq(data.take(60), data.drop(60)), Seq(tomb)), Seq(false, true))
    val want = rowPath(schema, Seq(data, tomb), Seq(false, true))
    assert(got == want)
    assert(got.map(_.head.asInstanceOf[Long]) ==
      ((1L to 49L) ++ (301L to 320L)).map(identity))
  }

  test("stretch ending exactly at a batch boundary hands off to the next " +
    "batch without losing or duplicating rows") {
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    def row(k: Long, t: String) =
      new GenericInternalRow(Array[Any](k, UTF8String.fromString(s"$t$k")))
    // run0 batch1 = evens 2..10, batch2 = 12,14; run1 = 5,9,11: the slice
    // below 11 consumes batch1 to its exact end (advanceBy -> needPull)
    val r0b1 = Seq(2L, 4L, 6L, 8L, 10L).map(row(_, "a"))
    val r0b2 = Seq(12L, 14L).map(row(_, "a"))
    val r1 = Seq(5L, 9L, 11L).map(row(_, "b"))

    val got = batchPath(schema, Seq(Seq(r0b1, r0b2), Seq(r1)), Seq(false, false))
    val want = rowPath(schema, Seq(r0b1 ++ r0b2, r1), Seq(false, false))
    assert(got == want)
    assert(got.map(_.head.asInstanceOf[Long]) ==
      Seq(2L, 4L, 5L, 6L, 8L, 9L, 10L, 11L, 12L, 14L))
  }

  test("non-copyable schema (nested array) falls back to the per-row " +
    "converter with identical results and no slice-gauge movement") {
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("xs", ArrayType(LongType))))
    def row(k: Long, mult: Long) = new GenericInternalRow(Array[Any](k,
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(k, k * mult))))
    val base = (1L to 500L).map(row(_, 2))
    val delta = (1L to 500L by 5).map(row(_, 3))

    val before = BatchMergeIterator.sliceCopiedRows.sum()
    val got = batchPath(schema, Seq(Seq(base), Seq(delta)), Seq(false, false))
    val want = rowPath(schema, Seq(base, delta), Seq(false, false))
    assert(got == want)
    assert(BatchMergeIterator.sliceCopiedRows.sum() == before,
      "nested schema must NOT claim the slice path")
  }

  test("end-to-end gauge: a decimal-schema MOR table scan takes the " +
    "columnar slice path through the DSv2 reader") {
    withTempPath { dir =>
      import spark.implicits._
      val base = (1L to 4000L)
        .map(i => (i, BigDecimal(i) + 0.25, s"v$i")).toDF("k", "price", "v")
        .withColumn("price", org.apache.spark.sql.functions.col("price").cast("decimal(12,2)"))
      val t = GraftTable.create(spark, base, dir,
        hashColumns = Seq("k"), bucketNum = 2)
      val delta = (1L to 4000L by 20)
        .map(i => (i, BigDecimal(i) + 9.75, s"w$i")).toDF("k", "price", "v")
        .withColumn("price", org.apache.spark.sql.functions.col("price").cast("decimal(12,2)"))
      t.upsert(delta)

      val before = BatchMergeIterator.sliceCopiedRows.sum()
      val merged = t.toDF
      val n = merged.count()
      assert(n == 4000)
      val updated = merged.filter($"k" === 21L).select("price", "v").collect().head
      assert(updated.getString(1) == "w21")
      assert(updated.getDecimal(0) == new java.math.BigDecimal("30.75"))
      assert(BatchMergeIterator.sliceCopiedRows.sum() - before > 0,
        "decimal MOR read must exercise the columnar slice copier")
    }
  }
}
