package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.sources.{EqualNullSafe, EqualTo, In, IsNull}

import graft.util.Filters
import graft.write.TransactionalWrite

/** Value-set partition pruning: intersection of equality/IN conjuncts,
  * cartesian exact-desc enumeration, cap, and sentinel encoding. */
class FiltersSuite extends AnyFunSuite {

  test("rangeValueSets intersects conjuncts per column") {
    val sets = Filters.rangeValueSets(
      Seq(In("p", Array("a", "b", "c")), EqualTo("p", "b"), EqualTo("q", "x"),
        EqualTo("other", "z")),
      Seq("p", "q"))
    assert(sets == Map("p" -> Set("b"), "q" -> Set("x")))
    // contradictory conjuncts -> provably empty
    val empty = Filters.rangeValueSets(
      Seq(EqualTo("p", "a"), EqualTo("p", "b")), Seq("p"))
    assert(empty == Map("p" -> Set.empty))
  }

  test("exactDescs enumerates the cartesian product in range-column order") {
    val sets = Map("p" -> Set("a", "b"), "q" -> Set("1", "2"))
    assert(Filters.exactDescs(sets, Seq("p", "q")) ==
      Some(Seq("p=a,q=1", "p=a,q=2", "p=b,q=1", "p=b,q=2")))
    // column order follows the TABLE's range columns, not the map
    assert(Filters.exactDescs(sets, Seq("q", "p")) ==
      Some(Seq("q=1,p=a", "q=1,p=b", "q=2,p=a", "q=2,p=b")))
    // any unpinned range column -> None (predicate pruning applies instead)
    assert(Filters.exactDescs(Map("p" -> Set("a")), Seq("p", "q")).isEmpty)
    assert(Filters.exactDescs(Map.empty[String, Set[String]], Seq("p")).isEmpty)
    // empty set -> Some(Nil): provably no partitions
    assert(Filters.exactDescs(Map("p" -> Set.empty[String]), Seq("p")) ==
      Some(Nil))
    // product above the cap -> None
    val big = Map("p" -> (1 to 65).map(_.toString).toSet)
    assert(Filters.exactDescs(big, Seq("p")).isEmpty)
  }

  test("sentinel encoding matches the write side") {
    val sets = Filters.rangeValueSets(
      Seq(EqualTo("p", null), EqualTo("q", "")), Seq("p", "q"))
    assert(sets("p") == Set(TransactionalWrite.NullSentinel))
    assert(sets("q") == Set(TransactionalWrite.EmptySentinel))
    // IS NULL / null-safe equality pin the null-sentinel partition
    val nulls = Filters.rangeValueSets(
      Seq(IsNull("p"), EqualNullSafe("q", "x")), Seq("p", "q"))
    assert(nulls("p") == Set(TransactionalWrite.NullSentinel))
    assert(nulls("q") == Set("x"))
  }

  test("rangeOrderingPred prunes string partitions by byte order") {
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan, StringStartsWith}
    val pred = Filters.rangeOrderingPred(
      Seq(GreaterThanOrEqual("dt", "2026-01-01"), LessThan("dt", "2026-02-01")),
      Seq("dt"), _ == "dt")
    assert(pred("dt=2026-01-01") && pred("dt=2026-01-31"))
    assert(!pred("dt=2025-12-31") && !pred("dt=2026-02-01"))
    // NULL partition never satisfies an ordering conjunct
    assert(!pred(s"dt=${TransactionalWrite.NullSentinel}"))
    // prefix match
    val pfx = Filters.rangeOrderingPred(
      Seq(StringStartsWith("dt", "2026-01")), Seq("dt"), _ == "dt")
    assert(pfx("dt=2026-01-15") && !pfx("dt=2026-02-15"))
    // non-string column: conjunct ignored (no pruning, stays correct)
    val skip = Filters.rangeOrderingPred(
      Seq(GreaterThanOrEqual("n", "5")), Seq("n"), _ => false)
    assert(skip("n=10") && skip("n=4"))
  }

  test("partitionPredSets honors sets and rejects non-members") {
    val pred = Filters.partitionPredSets(Map("p" -> Set("a", "b")))
    assert(pred("p=a,q=9") && pred("p=b"))
    assert(!pred("p=c") && !pred("q=a"))
    assert(Filters.partitionPredSets(Map.empty)("anything"))
  }
}
