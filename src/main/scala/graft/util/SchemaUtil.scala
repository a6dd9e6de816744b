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

  // DSv2 connector-expression twins: Expressions.column/bucket/identity
  // PARSE their string args (a literal-dot name becomes a nested path and
  // fails V2ExpressionUtils.resolveRef at plan time) — build exact
  // single-part FieldReferences instead. FieldReference/LogicalExpressions
  // are private[sql], so the construction lives in the sql-package shim.
  import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}

  def qref(name: String): NamedReference =
    org.apache.spark.sql.graft.StreamShim.exactRef(name)

  def qbucket(n: Int, cols: Seq[String]): Transform =
    org.apache.spark.sql.graft.StreamShim.exactBucket(n, cols)

  def qidentity(name: String): Transform =
    org.apache.spark.sql.graft.StreamShim.exactIdentity(name)
}
