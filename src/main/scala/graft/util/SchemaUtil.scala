package graft.util

import org.apache.spark.sql.types.{DataType, StructType}

object SchemaUtil {
  def fromJson(json: String): StructType =
    DataType.fromJson(json).asInstanceOf[StructType]

  /** Top-level column reference by EXACT name — backtick-quoted so a name
    * containing a literal dot is not re-parsed as struct navigation
    * (`col("a.b")` resolves field b of struct a, not column "a.b"). Use
    * wherever internal code iterates schema/DataFrame field names. */
  def qcol(name: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.col(s"`${name.replace("`", "``")}`")
}
