package graft.read

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.types.StructType

import graft.tables.GraftTable

/** Shuffle-free equi-join between two co-bucketed PK tables (SURVEY.md §2.4
  * J4; reference: rules/SetPartitionAndOrdering.scala:41-127 +
  * test DeltaJoinSuite.scala, benchmark/io/deltaJoin).
  *
  * Both tables hash their primary keys with the same murmur3-mod expression
  * at write time, so all rows of a key live in the same bucket index on both
  * sides. The join zips the two bucket-aligned merged RDDs partition-by-
  * partition and hash-joins within each bucket — one narrow stage, zero
  * exchange, the exact plan `EnsureRequirements` would produce if both scans
  * reported HashPartitioning. Inner join on the shared hash columns; output
  * columns = keys ++ left non-keys ++ right non-keys (DataFrame join shape).
  */
object BucketedJoin {

  def join(left: GraftTable, right: GraftTable): DataFrame = {
    val li = left.info; val ri = right.info
    require(li.hasPrimaryKey && ri.hasPrimaryKey,
      "bucketedJoin requires primary-key tables on both sides")
    require(li.hashColumns == ri.hashColumns,
      s"hash columns differ: ${li.hashColumns} vs ${ri.hashColumns}")
    require(li.bucketNum == ri.bucketNum,
      s"bucket counts differ: ${li.bucketNum} vs ${ri.bucketNum}")
    require(li.cdcColumn.isEmpty && ri.cdcColumn.isEmpty,
      "bucketedJoin does not support CDC tables yet")
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

    val outSchema = StructType(
      keys.map(k => ls(k)) ++
        lOtherIdx.map(ls.fields(_)) ++
        rOtherIdx.map(i => {
          val f = rs.fields(i)
          if (ls.fieldNames.contains(f.name)) f.copy(name = f.name + "_r") else f
        }))
    val nOut = outSchema.length

    val joined = lRdd.zipPartitions(rRdd, preservesPartitioning = true) {
      (lIt, rIt) =>
        // build on the right side: one bucket's merged rows
        val buildMap = new scala.collection.mutable.HashMap[IndexedSeq[Any],
          scala.collection.mutable.ArrayBuffer[InternalRow]]()
        rIt.foreach { row =>
          val key: IndexedSeq[Any] = rKeyIdx.indices.map(i =>
            if (row.isNullAt(rKeyIdx(i))) null else row.get(rKeyIdx(i), keyTypes(i)))
          if (!key.contains(null))
            buildMap.getOrElseUpdate(key,
              new scala.collection.mutable.ArrayBuffer[InternalRow]()) += row.copy()
        }
        val proj = UnsafeProjection.create(outSchema.fields.map(_.dataType))
        lIt.flatMap { lRow =>
          val key: IndexedSeq[Any] = lKeyIdx.indices.map(i =>
            if (lRow.isNullAt(lKeyIdx(i))) null else lRow.get(lKeyIdx(i), keyTypes(i)))
          buildMap.get(key) match {
            case None => Iterator.empty
            case Some(matches) =>
              val lVals = new Array[Any](lKeyIdx.length + lOtherIdx.length)
              var i = 0
              while (i < lKeyIdx.length) {
                lVals(i) = if (lRow.isNullAt(lKeyIdx(i))) null
                  else lRow.get(lKeyIdx(i), keyTypes(i))
                i += 1
              }
              var j = 0
              while (j < lOtherIdx.length) {
                val idx = lOtherIdx(j)
                lVals(lKeyIdx.length + j) =
                  if (lRow.isNullAt(idx)) null else lRow.get(idx, lTypes(idx))
                j += 1
              }
              matches.iterator.map { rRow =>
                val out = new GenericInternalRow(nOut)
                var x = 0
                while (x < lVals.length) {
                  if (lVals(x) == null) out.setNullAt(x) else out.update(x, lVals(x))
                  x += 1
                }
                var y = 0
                while (y < rOtherIdx.length) {
                  val idx = rOtherIdx(y)
                  val v = if (rRow.isNullAt(idx)) null else rRow.get(idx, rTypes(idx))
                  if (v == null) out.setNullAt(lVals.length + y)
                  else out.update(lVals.length + y, v)
                  y += 1
                }
                proj(out).copy(): InternalRow
              }
          }
        }
    }
    org.apache.spark.sql.graft.StreamShim.dfFromInternalRows(spark, joined, outSchema)
  }
}
