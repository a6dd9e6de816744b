package graft.read

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.tables.GraftTable

/** Shuffle-free equi-join between two co-bucketed PK tables (SURVEY.md §2.4
  * J4; reference: rules/SetPartitionAndOrdering.scala:41-127 +
  * test DeltaJoinSuite.scala, benchmark/io/deltaJoin).
  *
  * Both tables hash their primary keys with the same murmur3-mod expression
  * at write time, so all rows of a key live in the same bucket index on both
  * sides. The join zips the two bucket-aligned merged RDDs partition-by-
  * partition — one narrow stage, zero exchange, the exact plan
  * `EnsureRequirements` would produce if both scans reported HashPartitioning.
  *
  * In-bucket strategy:
  *   - UNPARTITIONED tables (no range columns): both merged streams arrive
  *     PK-SORTED and PK-UNIQUE out of the k-way merge, so a streaming
  *     two-pointer sorted-merge join runs in O(1) memory — no hash build, no
  *     bucket-sized heap structure. At 100 TB a single bucket can exceed
  *     executor heap; this path never materializes one.
  *   - RANGE-PARTITIONED tables: per-bucket streams are ordered by
  *     (partition-desc, pk), not globally by pk (and the two sides need not
  *     agree on partitioning), so the join falls back to an in-bucket hash
  *     build of the right side — memory bounded by the right bucket.
  *
  * CDC tables are supported: delete-tombstone rows are elided from both
  * inputs before joining (same F6 rule as snapshot reads).
  * Inner join on the shared hash columns; output columns = keys ++ left
  * non-keys ++ right non-keys (DataFrame join shape).
  */
object BucketedJoin {

  /** Two-row comparator on (possibly different) column indices per side. */
  private abstract class PairComp {
    def compare(l: InternalRow, r: InternalRow): Int
  }

  private def makePairComp(li: Int, ri: Int, dt: DataType): PairComp = {
    val base: PairComp = dt match {
      case LongType | TimestampType | TimestampNTZType => new PairComp {
        def compare(l: InternalRow, r: InternalRow): Int =
          java.lang.Long.compare(l.getLong(li), r.getLong(ri))
      }
      case IntegerType | DateType => new PairComp {
        def compare(l: InternalRow, r: InternalRow): Int =
          Integer.compare(l.getInt(li), r.getInt(ri))
      }
      case StringType => new PairComp {
        def compare(l: InternalRow, r: InternalRow): Int =
          l.getUTF8String(li).compareTo(r.getUTF8String(ri))
      }
      case DoubleType => new PairComp {
        def compare(l: InternalRow, r: InternalRow): Int =
          java.lang.Double.compare(l.getDouble(li), r.getDouble(ri))
      }
      case d: DecimalType => new PairComp {
        def compare(l: InternalRow, r: InternalRow): Int =
          l.getDecimal(li, d.precision, d.scale)
            .compareTo(r.getDecimal(ri, d.precision, d.scale))
      }
      case other =>
        val ord = TypeUtils.getInterpretedOrdering(other)
        new PairComp {
          def compare(l: InternalRow, r: InternalRow): Int =
            ord.compare(l.get(li, other), r.get(ri, other))
        }
    }
    new PairComp {
      def compare(l: InternalRow, r: InternalRow): Int = {
        val ln = l.isNullAt(li); val rn = r.isNullAt(ri)
        if (ln && rn) 0 else if (ln) -1 else if (rn) 1 else base.compare(l, r)
      }
    }
  }

  def join(left: GraftTable, right: GraftTable): DataFrame = {
    val li = left.info; val ri = right.info
    require(li.hasPrimaryKey && ri.hasPrimaryKey,
      "bucketedJoin requires primary-key tables on both sides")
    require(li.hashColumns == ri.hashColumns,
      s"hash columns differ: ${li.hashColumns} vs ${ri.hashColumns}")
    require(li.bucketNum == ri.bucketNum,
      s"bucket counts differ: ${li.bucketNum} vs ${ri.bucketNum}")
    val ls = left.schema; val rs = right.schema
    val keys = li.hashColumns
    keys.foreach { k =>
      require(ls(k).dataType == rs(k).dataType,
        s"join key '$k' type mismatch: ${ls(k).dataType} vs ${rs(k).dataType}")
    }
    val lFiles = left.liveFiles; val rFiles = right.liveFiles
    require(BucketMergeRead.supports(li, ls, lFiles)
      && BucketMergeRead.supports(ri, rs, rFiles),
      "bucketedJoin requires bucket-merge-readable tables (no schema drift)")
    // bucket-index pairing assumes BOTH sides' files were hashed under the
    // CURRENT count's mapping: mid re-bucket (open marker / crashed
    // attempt) or mid restore recovery a side can carry another mapping —
    // pairing would join different key sets per index (silently wrong)
    Seq(("left", li, lFiles), ("right", ri, rFiles)).foreach {
      case (side, ti, fs) =>
        require(graft.meta.RebucketLog.settledAt(ti.properties, ti.bucketNum, fs),
          s"bucketedJoin: the $side table's key->bucket mapping is not " +
            "settled (re-bucket in progress, a crashed re-bucket's open " +
            "marker, or an unfinished restore); finish or repair() it, or " +
            "use a regular join until it completes")
    }

    val spark = left.spark
    val lRdd = BucketMergeRead.readRdd(spark, li, ls, lFiles)
    val rRdd = BucketMergeRead.readRdd(spark, ri, rs, rFiles)

    val lKeyIdx = keys.map(ls.fieldIndex).toArray
    val rKeyIdx = keys.map(rs.fieldIndex).toArray
    val keyTypes = keys.map(ls(_).dataType).toArray
    val lOtherIdx = ls.fieldNames.indices.filterNot(lKeyIdx.contains).toArray
    val rOtherIdx = rs.fieldNames.indices.filterNot(rKeyIdx.contains).toArray
    val lTypes = ls.fields.map(_.dataType)
    val rTypes = rs.fields.map(_.dataType)
    val lCdcIdx = li.cdcColumn.map(ls.fieldIndex).getOrElse(-1)
    val rCdcIdx = ri.cdcColumn.map(rs.fieldIndex).getOrElse(-1)
    // streams are globally pk-sorted per bucket only without range tiers
    val mergeJoinable = li.rangeColumns.isEmpty && ri.rangeColumns.isEmpty

    val outSchema = StructType(
      keys.map(k => ls(k)) ++
        lOtherIdx.map(ls.fields(_)) ++
        rOtherIdx.map(i => {
          val f = rs.fields(i)
          if (ls.fieldNames.contains(f.name)) f.copy(name = f.name + "_r") else f
        }))
    val nOut = outSchema.length

    val joined = lRdd.zipPartitions(rRdd, preservesPartitioning = true) {
      (lIt0, rIt0) =>
        val deleteTag = UTF8String.fromString("delete")
        def elide(it: Iterator[InternalRow], cdcIdx: Int) =
          if (cdcIdx < 0) it
          else it.filter(r => r.isNullAt(cdcIdx) ||
            !r.getUTF8String(cdcIdx).equals(deleteTag))
        val lIt = elide(lIt0, lCdcIdx)
        val rIt = elide(rIt0, rCdcIdx)
        val proj = UnsafeProjection.create(outSchema.fields.map(_.dataType))

        def buildOut(lRow: InternalRow, rRow: InternalRow): InternalRow = {
          val out = new GenericInternalRow(nOut)
          var i = 0
          while (i < lKeyIdx.length) {
            val idx = lKeyIdx(i)
            if (lRow.isNullAt(idx)) out.setNullAt(i)
            else out.update(i, lRow.get(idx, keyTypes(i)))
            i += 1
          }
          var j = 0
          while (j < lOtherIdx.length) {
            val idx = lOtherIdx(j)
            if (lRow.isNullAt(idx)) out.setNullAt(lKeyIdx.length + j)
            else out.update(lKeyIdx.length + j, lRow.get(idx, lTypes(idx)))
            j += 1
          }
          var y = 0
          while (y < rOtherIdx.length) {
            val idx = rOtherIdx(y)
            val pos = lKeyIdx.length + lOtherIdx.length + y
            if (rRow.isNullAt(idx)) out.setNullAt(pos)
            else out.update(pos, rRow.get(idx, rTypes(idx)))
            y += 1
          }
          proj(out).copy(): InternalRow
        }

        if (mergeJoinable) {
          // O(1)-memory streaming sorted-merge join: both inputs pk-sorted
          // and pk-unique (k-way merge output), so equal keys pair 1:1
          val comps = keys.indices.map(i =>
            makePairComp(lKeyIdx(i), rKeyIdx(i), keyTypes(i))).toArray
          new Iterator[InternalRow] {
            private var l: InternalRow = if (lIt.hasNext) lIt.next() else null
            private var r: InternalRow = if (rIt.hasNext) rIt.next() else null
            private var out: InternalRow = null
            private def cmp(a: InternalRow, b: InternalRow): Int = {
              var i = 0
              while (i < comps.length) {
                val c = comps(i).compare(a, b)
                if (c != 0) return c
                i += 1
              }
              0
            }
            private def findNext(): Unit = {
              while (out == null && l != null && r != null) {
                val c = cmp(l, r)
                if (c < 0) l = if (lIt.hasNext) lIt.next() else null
                else if (c > 0) r = if (rIt.hasNext) rIt.next() else null
                else {
                  out = buildOut(l, r) // copies values before either advance
                  l = if (lIt.hasNext) lIt.next() else null
                  r = if (rIt.hasNext) rIt.next() else null
                }
              }
            }
            def hasNext: Boolean = { findNext(); out != null }
            def next(): InternalRow = {
              findNext(); val o = out; out = null; o
            }
          }
        } else {
          // range-partitioned: per-bucket order is (partition, pk) — hash
          // build the right bucket (memory bounded by one bucket's rows)
          val buildMap = new scala.collection.mutable.HashMap[IndexedSeq[Any],
            scala.collection.mutable.ArrayBuffer[InternalRow]]()
          rIt.foreach { row =>
            val key: IndexedSeq[Any] = rKeyIdx.indices.map(i =>
              if (row.isNullAt(rKeyIdx(i))) null else row.get(rKeyIdx(i), keyTypes(i)))
            if (!key.contains(null))
              buildMap.getOrElseUpdate(key,
                new scala.collection.mutable.ArrayBuffer[InternalRow]()) += row.copy()
          }
          lIt.flatMap { lRow =>
            val key: IndexedSeq[Any] = lKeyIdx.indices.map(i =>
              if (lRow.isNullAt(lKeyIdx(i))) null else lRow.get(lKeyIdx(i), keyTypes(i)))
            buildMap.get(key) match {
              case None => Iterator.empty
              case Some(matches) => matches.iterator.map(rRow => buildOut(lRow, rRow))
            }
          }
        }
    }
    org.apache.spark.sql.graft.StreamShim.dfFromInternalRows(spark, joined, outSchema)
  }
}
