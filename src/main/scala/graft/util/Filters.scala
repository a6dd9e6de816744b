package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._

/** Shared source-Filter helpers for the DSv1 relation and DSv2 scan builder. */
object Filters {

  /** Best-effort Filter -> Column translation. Untranslatable filters map to
    * None; callers treat every filter as residual anyway (Spark re-applies
    * above the scan), so this is purely an optimization channel. */
  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case And(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case Or(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case Not(c) => toColumn(c).map(!_)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case _ => None
  }

  /** Range-column equality values for partition pruning, with the write
    * side's null/empty sentinels applied. */
  def rangeEqualities(filters: Seq[Filter], rangeColumns: Seq[String])
    : Map[String, String] =
    filters.collect {
      case EqualTo(a, v) if rangeColumns.contains(a) =>
        val s = String.valueOf(v)
        a -> (if (v == null) graft.write.TransactionalWrite.NullSentinel
          else if (s.isEmpty) graft.write.TransactionalWrite.EmptySentinel else s)
    }.toMap

  /** Partition-desc predicate from range equalities. */
  def partitionPred(rangeEq: Map[String, String]): String => Boolean =
    if (rangeEq.isEmpty) _ => true
    else desc => {
      val kv = desc.split(",").map { s =>
        val i = s.indexOf('='); s.substring(0, i) -> s.substring(i + 1)
      }.toMap
      rangeEq.forall { case (c, v) => kv.get(c).contains(v) }
    }
}
