package graft.tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.struct
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Nested-struct-field SET support for UPDATE / updateExpr (C3): rewrites a
  * set of possibly-dotted assignment paths into per-TOP-LEVEL-column
  * replacement values, rebuilding only the touched struct leaves.
  *
  * Semantics mirror the reference's recursive walk
  * (lakesoul-spark/src/main/scala/org/apache/spark/sql/lakesoul/UpdateExpressionsSupport.scala:39-108):
  *  - an assignment head that matches no field at its level is an error
  *    (never silently ignored);
  *  - an exact-path assignment must be the ONLY one touching that path —
  *    `SET a.b = 1, a.b.c = 2` (or `a = ..., a.b = ...`) is a conflict
  *    (reference :92-100);
  *  - descending through a non-struct type is an error;
  *  - the assigned value is cast to the target leaf's type;
  *  - a touched struct is REBUILT field-by-field (CreateNamedStruct), so a
  *    NULL struct row gains a non-null struct whose untouched children are
  *    null — the reference's behavior, not `Column.withField`'s
  *    null-propagation.
  *
  * The rebuild is pure Column/Catalyst expression work (codegen-friendly,
  * collapses under ordinary expression optimization); callers wrap the
  * result in their own `when(cond, ...)` guards and write paths.
  */
private[graft] object NestedUpdate {

  /** `caseSensitive=false` resolution matches the engine's C18 contract. */
  private def resolver(caseSensitive: Boolean): (String, String) => Boolean =
    if (caseSensitive) _ == _ else _.equalsIgnoreCase(_)

  /** Parse one SET key into name parts. Dots split nesting; backticks keep
    * a literal dot inside one part (`` `a.b` `` is the top-level column
    * "a.b"), same grammar `UnresolvedAttribute` uses for SQL identifiers. */
  def parsePath(key: String): Seq[String] =
    org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      .parseAttributeName(key).toSeq

  /** Rewrite `ops` (path → value) into a top-level SET map. Paths of size 1
    * pass through (cast to the column's type); deeper paths become a struct
    * rebuild of their top-level column. Validation (unknown names, prefix
    * conflicts, non-struct descent) happens here so every caller — API
    * `update`, SQL UPDATE, delta/marker variants — enforces one contract. */
  /** Encode a parsed path back into one dotted key (backtick-quoting parts
    * that contain dots/backticks) — the inverse of [[parsePath]], used to
    * carry nested MERGE assignment paths through string-keyed clause maps. */
  def encodePath(parts: Seq[String]): String =
    parts.map { p =>
      if (p.contains(".") || p.contains("`")) s"`${p.replace("`", "``")}`" else p
    }.mkString(".")

  def toTopLevelSet(
      schema: StructType,
      ops: Seq[(Seq[String], Column)],
      caseSensitive: Boolean): Map[String, Column] =
    toTopLevelSet(schema, ops, caseSensitive, topCol)

  /** `base` resolves a TOP-LEVEL column name to the Column the rebuild
    * reads untouched fields from — `col(name)` for UPDATE over the table's
    * own frame, `GraftMerge.target(name)` inside a MERGE join frame. */
  def toTopLevelSet(
      schema: StructType,
      ops: Seq[(Seq[String], Column)],
      caseSensitive: Boolean,
      base: String => Column): Map[String, Column] = {
    val res = resolver(caseSensitive)
    require(ops.nonEmpty, "UPDATE requires at least one SET assignment")
    ops.foreach(o => require(o._1.nonEmpty, "empty SET column path"))
    // global prefix-conflict check (the reference discovers these level by
    // level; one pairwise pass reports the same set)
    for (i <- ops.indices; j <- ops.indices if i != j) {
      val (p, q) = (ops(i)._1, ops(j)._1)
      if (p.length <= q.length && p.indices.forall(k => res(p(k), q(k))))
        throw new UnsupportedOperationException(
          s"conflicting UPDATE SET paths: '${p.mkString(".")}' and " +
            s"'${q.mkString(".")}' touch the same column")
    }
    ops.groupBy(o => resolveField(schema, o._1.head, Nil, res).name)
      .map { case (topName, group) =>
        val field = resolveField(schema, topName, Nil, res)
        val rebuilt = group.find(_._1.size == 1) match {
          case Some((_, v)) => castTo(v, field.dataType)
          case None =>
            applyOps(base(field.name), field.dataType,
              group.map { case (p, v) => (p.tail, v) }, Seq(field.name), res)
        }
        field.name -> rebuilt
      }
  }

  /** Top-level column reference, backtick-quoted so a name containing a
    * literal dot is not re-parsed as nesting. */
  private def topCol(name: String): Column =
    org.apache.spark.sql.functions.col(s"`${name.replace("`", "``")}`")

  private def resolveField(st: StructType, name: String,
      prefix: Seq[String], res: (String, String) => Boolean): StructField =
    st.fields.find(f => res(f.name, name)).getOrElse(
      throw new IllegalArgumentException(
        s"UPDATE SET column '${(prefix :+ name).mkString(".")}' not found " +
          s"among ${st.fields.map(f => (prefix :+ f.name).mkString(".")).mkString(", ")}"))

  private def castTo(v: Column, dt: DataType): Column = v.cast(dt)

  /** Rebuild `base` (a struct-typed column) with `ops` applied; every op
    * path is relative to this node and non-empty (exact matches were
    * consumed one level up). */
  private def applyOps(base: Column, tpe: DataType,
      ops: Seq[(Seq[String], Column)], prefix: Seq[String],
      res: (String, String) => Boolean): Column = tpe match {
    case st: StructType =>
      // unknown heads are errors even when other ops match (reference :71-77)
      ops.foreach(o => resolveField(st, o._1.head, prefix, res))
      val children = st.fields.map { f =>
        val hit = ops.filter(o => res(o._1.head, f.name))
        val value =
          if (hit.isEmpty) base.getField(f.name)
          else hit.find(_._1.size == 1) match {
            case Some((_, v)) => castTo(v, f.dataType)
            case None =>
              applyOps(base.getField(f.name), f.dataType,
                hit.map { case (p, v) => (p.tail, v) }, prefix :+ f.name, res)
          }
        value.as(f.name)
      }
      struct(children.toIndexedSeq: _*)
    case other =>
      throw new UnsupportedOperationException(
        s"UPDATE SET cannot descend into '${prefix.mkString(".")}' of " +
          s"non-struct type ${other.simpleString}")
  }
}
