package graft

/** Graft-FORMAT TPC-H (VERDICT r5 gap #2): the q*_graft entries run the
  * identical plans as their raw-parquet twins but read graft tables
  * (PK-bucketed dimensions + plain lineitem) through the engine's DSv2
  * scan — results must be row-identical across all 22 queries, which is
  * also what pins their shared DuckDB oracles green in CORRECTNESS. */
class TpchGraftSuite extends SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  SparkEntry.graftTwins.toSeq.sortBy(_._1).foreach { case (graftQ, rawQ) =>
    test(s"$graftQ matches $rawQ over the same data") {
      val g = SparkEntry.queries(graftQ)(spark, sf)
      val r = SparkEntry.queries(rawQ)(spark, sf)
      assertSameRows(g, r)
    }
  }

  test("graft variants share their raw twins' oracles") {
    SparkEntry.graftTwins.foreach { case (g, r) =>
      assert(SparkEntry.oracleSql(g) == SparkEntry.oracleSql(r))
    }
  }

  test("graft variants scan through the DSv2 catalog (BatchScan + GraftScan)") {
    val plan = SparkEntry.queries("q1_graft")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan") && plan.contains("GraftScan"),
      s"q1_graft must read via the DSv2 GraftScan, got:\n$plan")
    // a PK-bucketed dimension also reports its scan through DSv2
    val plan5 = SparkEntry.queries("q5_graft")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan5.contains("GraftScan"),
      s"q5_graft must read via the DSv2 GraftScan, got:\n$plan5")
  }
}
