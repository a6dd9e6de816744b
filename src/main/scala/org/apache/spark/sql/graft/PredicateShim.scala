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
