package graft.read

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

import graft.mergeop.MergeOps
import graft.meta.{ResolvedFile, TableInfo}
import graft.write.TransactionalWrite

/** Shuffle-free merge-on-read: the Spark-native rendition of the reference's
  * sorted-stream merger (SURVEY.md §2.2 M1,
  * rust/lakesoul-io/src/physical_plan/merge/sorted/sorted_stream_merger.rs).
  *
  * Every sorted run is hash-bucketed identically at write time, so all rows
  * of one primary key live in bucket `pmod(hash(pk), n)` of every run. The
  * read therefore parallelizes by BUCKET: one task per bucket opens its K
  * run iterators (Spark's own vectorized parquet reader via a serialized
  * read-function — no shuffle, no driver data path) and k-way-merges them by
  * (range-partition, pk) with the per-column merge operators.
  *
  * vs the aggregate-based merge (GraftRead.mergeRead): no exchange at all —
  * wall-clock is one narrow stage, and at 1000-executor scale the merge cost
  * stays proportional to live rows per bucket instead of re-shuffling the
  * table on every read. Parallelism = bucketNum (choose bucketNum ~ cluster
  * cores at table-creation time, exactly like the reference).
  *
  * Falls back to the aggregate path when per-file schemas differ (schema
  * evolution) — GraftRead picks the route.
  */
object BucketMergeRead {

  /** One run of one bucket: files sorted by partition desc. */
  private case class BucketGroup(bucket: Int, runs: Seq[Seq[PartitionedFile]])

  def supports(table: TableInfo, schema: StructType, files: Seq[ResolvedFile]): Boolean = {
    // existCols always lists the table's full physical columns at write time,
    // independent of read-side pruning
    val fullCols = graft.util.SchemaUtil.fromJson(table.schemaJson)
      .fieldNames.mkString(",")
    table.hasPrimaryKey &&
      files.forall(f => f.file.bucketId >= 0 && f.file.bucketId < table.bucketNum) &&
      files.forall(f => f.file.existCols.isEmpty || f.file.existCols == fullCols) &&
      schema.fields.forall(f => mergeSupported(table, f))
  }

  private def mergeSupported(table: TableInfo, f: StructField): Boolean =
    TransactionalWrite.mergeOpFor(table, f.name) match {
      case MergeOps.UseLast | MergeOps.UseLastNotNull => orderableOrAny(f.dataType)
      case MergeOps.SumAll | MergeOps.SumLast => f.dataType match {
        case IntegerType | LongType | DoubleType | FloatType | ShortType => true
        case _ => false
      }
      case MergeOps.JoinedAll(_) | MergeOps.JoinedLast(_) => f.dataType == StringType
      case _ => false // user-registered ops route to the aggregate merge
    }

  private def orderableOrAny(dt: DataType): Boolean = true

  def read(
      spark: SparkSession,
      table: TableInfo,
      schema: StructType,
      files: Seq[ResolvedFile]): DataFrame =
    org.apache.spark.sql.graft.StreamShim.dfFromInternalRows(
      spark, readRdd(spark, table, schema, files), schema)

  /** The merged rows as an RDD whose partition index == bucket id (the
    * basis for co-located bucketed joins, SURVEY.md §2.4 J4). */
  def readRdd(
      spark: SparkSession,
      table: TableInfo,
      schema: StructType,
      files: Seq[ResolvedFile])
    : org.apache.spark.rdd.RDD[InternalRow] = {
    val readFn = org.apache.spark.sql.graft.StreamShim.parquetReadFunction(spark, schema)

    // bucket -> ordered runs; a "run" r = all ordinal-r files of the bucket
    // across range partitions, concatenated in partition-desc order (files
    // are internally sorted by (range, pk), and descs are disjoint key
    // ranges under the desc-string comparator below)
    val groups: Seq[BucketGroup] = (0 until table.bucketNum).map { b =>
      val mine = files.filter(_.file.bucketId == b)
      val runs = mine.groupBy(_.commitOrdinal).toSeq.sortBy(_._1).map {
        case (_, fs) =>
          fs.sortBy(_.partitionDesc).map { f =>
            PartitionedFile(InternalRow.empty, SparkPath.fromPathString(f.file.path),
              0L, f.file.size)
          }
      }
      BucketGroup(b, runs)
    }

    val keyIdx = (table.rangeColumns ++ table.hashColumns).map(schema.fieldIndex)
    val keyTypes = keyIdx.map(schema.fields(_).dataType)
    val fieldMerges: Array[FieldMerge] = schema.fields.zipWithIndex.map {
      case (f, i) => FieldMerge(i, f.dataType,
        // sum_last/joined_last collapse to sum/join at read time: each run
        // already holds only its last value per key (dedup-on-write applied
        // the intra-batch last-writer-wins)
        TransactionalWrite.mergeOpFor(table, f.name) match {
          case MergeOps.UseLast => 0
          case MergeOps.UseLastNotNull => 1
          case MergeOps.SumAll | MergeOps.SumLast => 2
          case MergeOps.JoinedAll(_) | MergeOps.JoinedLast(_) => 3
          case other => throw new IllegalStateException(
            s"bucket merge does not support operator '${other.name}'")
        },
        TransactionalWrite.mergeOpFor(table, f.name) match {
          case MergeOps.JoinedAll(sep) => sep
          case MergeOps.JoinedLast(sep) => sep
          case _ => ","
        })
    }
    val nFields = schema.length
    val keyIdxArr = keyIdx.toArray
    val keyTypesArr = keyTypes.toArray

    spark.sparkContext
      .parallelize(groups, math.max(1, groups.size))
      .mapPartitions { it =>
        val proj = UnsafeProjection.create(schema.fields.map(_.dataType))
        it.flatMap { g =>
          val runIters: IndexedSeq[Iterator[InternalRow]] = g.runs.map { run =>
            run.iterator.flatMap(pf => flatten(readFn(pf)))
          }.toIndexedSeq
          val merged: Iterator[InternalRow] =
            if (runIters.isEmpty) Iterator.empty
            else if (runIters.size == 1) runIters.head
            else new KWayMergeIterator(runIters, keyIdxArr, keyTypesArr,
              fieldMerges, nFields)
          merged.map(proj)
        }
      }
  }

  /** The vectorized reader yields ColumnarBatch disguised as InternalRow. */
  private def flatten(it: Iterator[InternalRow]): Iterator[InternalRow] =
    it.flatMap {
      case b: ColumnarBatch =>
        val rows = b.rowIterator()
        new Iterator[InternalRow] {
          def hasNext: Boolean = rows.hasNext
          def next(): InternalRow = rows.next()
        }
      case r => Iterator.single(r)
    }
}

/** Per-output-field merge spec: op 0=use_last 1=use_last_not_null 2=sum_all
  * 3=joined_all. */
private[read] case class FieldMerge(idx: Int, dt: DataType, op: Int, sep: String)

/** K-way sorted merge by (range, pk) with per-column merge operators.
  * Run 0 is the oldest; on equal keys, later runs win per the operator.
  * Input iterators may reuse row objects (vectorized reader), so held heads
  * are copied. */
private[read] class KWayMergeIterator(
    runs: IndexedSeq[Iterator[InternalRow]],
    keyIdx: Array[Int],
    keyTypes: Array[DataType],
    fields: Array[FieldMerge],
    nFields: Int) extends Iterator[InternalRow] {

  private val k = runs.size
  private val heads = new Array[InternalRow](k)
  private val orderings = keyTypes.map(TypeUtils.getInterpretedOrdering)
  (0 until k).foreach(advance)

  private def advance(i: Int): Unit =
    heads(i) = if (runs(i).hasNext) runs(i).next().copy() else null

  private def compareKeys(a: InternalRow, b: InternalRow): Int = {
    var i = 0
    while (i < keyIdx.length) {
      val x = if (a.isNullAt(keyIdx(i))) null else a.get(keyIdx(i), keyTypes(i))
      val y = if (b.isNullAt(keyIdx(i))) null else b.get(keyIdx(i), keyTypes(i))
      val c =
        if (x == null && y == null) 0
        else if (x == null) -1 // nulls first, matching the write-side sort
        else if (y == null) 1
        else orderings(i).compare(x, y)
      if (c != 0) return c
      i += 1
    }
    0
  }

  override def hasNext: Boolean = heads.exists(_ != null)

  override def next(): InternalRow = {
    // find the minimal key among heads
    var minIdx = -1
    var i = 0
    while (i < k) {
      if (heads(i) != null &&
          (minIdx == -1 || compareKeys(heads(i), heads(minIdx)) < 0)) minIdx = i
      i += 1
    }
    // fold all equal-key heads oldest -> newest through the merge operators
    var acc = heads(minIdx)
    advance(minIdx)
    var j = minIdx + 1
    while (j < k) {
      if (heads(j) != null && compareKeys(heads(j), acc) == 0) {
        acc = mergeRows(acc, heads(j))
        advance(j)
      }
      j += 1
    }
    acc
  }

  private def mergeRows(older: InternalRow, newer: InternalRow): InternalRow = {
    val out = new GenericInternalRow(nFields)
    var i = 0
    while (i < fields.length) {
      val f = fields(i)
      val idx = f.idx
      val o = if (older.isNullAt(idx)) null else older.get(idx, f.dt)
      val n = if (newer.isNullAt(idx)) null else newer.get(idx, f.dt)
      val v: Any = f.op match {
        case 0 => n // use_last: the newer run's value, null included
        case 1 => if (n != null) n else o // use_last_not_null
        case 2 => // sum_all: null poisons (merge_operator.rs:489-532)
          if (o == null || n == null) null
          else f.dt match {
            case IntegerType => o.asInstanceOf[Int] + n.asInstanceOf[Int]
            case LongType => o.asInstanceOf[Long] + n.asInstanceOf[Long]
            case DoubleType => o.asInstanceOf[Double] + n.asInstanceOf[Double]
            case FloatType => o.asInstanceOf[Float] + n.asInstanceOf[Float]
            case ShortType =>
              (o.asInstanceOf[Short] + n.asInstanceOf[Short]).toShort
            case other => throw new IllegalStateException(s"sum_all on $other")
          }
        case 3 => // joined_all: non-null values in version order
          if (o == null) n
          else if (n == null) o
          else UTF8String.concat(o.asInstanceOf[UTF8String],
            UTF8String.fromString(f.sep), n.asInstanceOf[UTF8String])
      }
      if (v == null) out.setNullAt(idx) else out.update(idx, v)
      i += 1
    }
    out
  }
}
