package org.apache.spark.sql.execution

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.vectorized.WritableColumnVector
import org.apache.spark.sql.types.StructType

/** Lives in org.apache.spark.sql.execution to reach private[execution]
  * internals (same technique as the sql.graft StreamShim): exposes Spark's
  * own RowToColumnConverter, which the columnar k-way merge uses to append
  * overlap-region rows into its builder batch. */
object GraftExecShim {
  def rowToColumnConverter(schema: StructType)
      : (InternalRow, Array[WritableColumnVector]) => Unit = {
    val c = new RowToColumnConverter(schema)
    (row, vecs) => c.convert(row, vecs)
  }
}
