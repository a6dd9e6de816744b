package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{Cast, ColumnNode, Literal, UnresolvedAttribute, UnresolvedFunction}

/** Predicate analysis over the (private[sql]) ColumnNode tree that API-built
  * Columns carry before analysis — used by the tiered update/delete path to
  * split conjuncts, find referenced columns and extract PK equalities
  * without forcing a plan. */
object PredicateShim {

  /** Top-level AND-conjuncts of the predicate. */
  def conjuncts(c: Column): Seq[Column] = {
    def split(n: ColumnNode): Seq[ColumnNode] = n match {
      case f: UnresolvedFunction
          if f.functionName.equalsIgnoreCase("and") && f.arguments.size == 2 =>
        split(f.arguments(0)) ++ split(f.arguments(1))
      case x => Seq(x)
    }
    split(c.node).map(new Column(_))
  }

  /** Column names referenced by the predicate — None when the tree contains
    * a node kind we don't recognize (callers must stay conservative). */
  def refNames(c: Column): Option[Set[String]] = {
    def refs(n: ColumnNode): Option[Set[String]] = n match {
      case a: UnresolvedAttribute => Some(Set(a.nameParts.mkString(".")))
      case _: Literal => Some(Set.empty)
      case f: UnresolvedFunction =>
        f.arguments.foldLeft(Option(Set.empty[String])) { (acc, ch) =>
          for { a <- acc; s <- refs(ch) } yield a ++ s
        }
      case cst: Cast => refs(cst.child)
      case _ => None
    }
    refs(c.node)
  }

  /** Best-effort translation of the predicate's top-level conjuncts into
    * data-source filters (for metadata file skipping). Untranslatable
    * conjuncts are simply omitted — callers may only use the result to
    * PRUNE conservatively, never to avoid re-applying the predicate. */
  def sourceFilters(c: Column): Seq[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources._
    def attrLit(f: UnresolvedFunction): Option[(String, Any, Boolean)] =
      (f.arguments(0), f.arguments(1)) match {
        case (a: UnresolvedAttribute, l: Literal) =>
          Some((a.nameParts.mkString("."), l.value, false))
        case (l: Literal, a: UnresolvedAttribute) =>
          Some((a.nameParts.mkString("."), l.value, true)) // operands flipped
        case _ => None
      }
    conjuncts(c).flatMap { cc =>
      cc.node match {
        case f: UnresolvedFunction if f.arguments.size == 2 =>
          f.functionName match {
            case "=" => attrLit(f).map { case (a, v, _) => EqualTo(a, v) }
            case ">" => attrLit(f).map { case (a, v, flip) =>
              if (flip) LessThan(a, v) else GreaterThan(a, v) }
            case ">=" => attrLit(f).map { case (a, v, flip) =>
              if (flip) LessThanOrEqual(a, v) else GreaterThanOrEqual(a, v) }
            case "<" => attrLit(f).map { case (a, v, flip) =>
              if (flip) GreaterThan(a, v) else LessThan(a, v) }
            case "<=" => attrLit(f).map { case (a, v, flip) =>
              if (flip) GreaterThanOrEqual(a, v) else LessThanOrEqual(a, v) }
            case _ => None
          }
        case _ => None
      }
    }
  }

  /** `col = literal` equalities among the top-level conjuncts, as plain
    * Scala values (pre-conversion literals). */
  def equalities(c: Column): Map[String, Any] =
    conjuncts(c).flatMap { cc =>
      cc.node match {
        case f: UnresolvedFunction
            if f.functionName == "=" && f.arguments.size == 2 =>
          (f.arguments(0), f.arguments(1)) match {
            case (a: UnresolvedAttribute, l: Literal) =>
              Some(a.nameParts.mkString(".") -> l.value)
            case (l: Literal, a: UnresolvedAttribute) =>
              Some(a.nameParts.mkString(".") -> l.value)
            case _ => None
          }
        case _ => None
      }
    }.toMap
}
