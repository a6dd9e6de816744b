package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSuite extends SparkFixture {
  import spark.implicits._

  test("point-in-interval: multi-bin intervals, inclusive bounds, no dup pairs") {
    val points = Seq((1L, "u", 5L), (2L, "u", 10L), (3L, "u", 25L), (4L, "v", 10L))
      .toDF("pid", "k", "t")
    // interval 100 spans bins [0..2] at width 10; both bounds inclusive
    val ivals = Seq((100L, "u", 5L, 25L), (200L, "u", 9L, 11L), (300L, "w", 0L, 50L))
      .toDF("iid", "k", "s", "e")
    val out = RangeJoin.pointInInterval(points, ivals,
        keys = Seq("k"), pointCol = "t", startCol = "s", endCol = "e",
        valueCols = Seq("iid"), binWidth = 10L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 100L), (2L, 100L), (3L, 100L), (2L, 200L)))
  }

  test("degenerate interval fails the job instead of exploding") {
    val points = Seq((1L, "u", 5L)).toDF("pid", "k", "t")
    val ivals = Seq((9L, "u", 0L, 100000L)).toDF("iid", "k", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, ivals, Seq("k"), "t", "s", "e",
        Seq("iid"), binWidth = 10L, maxBinsPerInterval = 100).count()
    }
    assert(e.getMessage != null)
  }
}
