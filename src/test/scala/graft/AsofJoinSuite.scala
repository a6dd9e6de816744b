package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSuite extends SparkFixture {
  import spark.implicits._

  private def quotes = Seq(
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)).toDF("sym", "qts", "px")

  private def trades = Seq(
    ("A", 5L, 100), ("A", 20L, 200), ("A", 25L, 300), ("A", 35L, 400),
    ("B", 14L, 500), ("C", 50L, 600)).toDF("sym", "ts", "qty")

  test("backward as-of join: most recent quote at-or-before each trade") {
    val out = AsofJoin.backward(trades, quotes,
        keys = Seq("sym"), leftTs = "ts", rightTs = "qts",
        valueCols = Seq("px", "qts"))
      .orderBy("sym", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      ("A", 5L, None),          // nothing at-or-before 5
      ("A", 20L, Some(2.0)),    // inclusive boundary: quote at 20 matches
      ("A", 25L, Some(2.0)),
      ("A", 35L, Some(3.0)),
      ("B", 14L, None),
      ("C", 50L, None)))        // key absent on the right
  }

  test("forward as-of join and tolerance gating") {
    val fwd = AsofJoin.forward(trades, quotes,
        keys = Seq("sym"), leftTs = "ts", rightTs = "qts",
        valueCols = Seq("px"))
      .orderBy("sym", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(fwd.toSeq == Seq(
      ("A", 5L, Some(1.0)),
      ("A", 20L, Some(2.0)),    // inclusive at equal ts
      ("A", 25L, Some(3.0)),
      ("A", 35L, None),         // nothing at-or-after 35
      ("B", 14L, Some(9.0)),
      ("C", 50L, None)))

    val tol = AsofJoin.backward(trades, quotes,
        keys = Seq("sym"), leftTs = "ts", rightTs = "qts",
        valueCols = Seq("px"), tolerance = Some(lit(4L)))
      .orderBy("sym", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    // ts=25 trade: quote at 20 is 5 ticks old > 4 -> nulled; ts=35 vs 30 too
    assert(tol.toSeq == Seq(
      ("A", 5L, None), ("A", 20L, Some(2.0)), ("A", 25L, None),
      ("A", 35L, None), ("B", 14L, None), ("C", 50L, None)))
  }

  test("as-of join plans one shuffle, no join node") {
    val out = AsofJoin.backward(trades, quotes,
      keys = Seq("sym"), leftTs = "ts", rightTs = "qts", valueCols = Seq("px"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected no join operator:\n$plan")
    // union + window: exactly the exchanges of the window's keys partition
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2, plan)
  }
}
