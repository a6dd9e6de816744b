package graft

/** Graft-FORMAT TPC-H (VERDICT r5 gap #2): the q*_graft entries run the
  * identical plans as their raw-parquet twins but read graft PK tables
  * through the engine's bucketed DSv2 scan — results must be row-identical,
  * which is also what pins their DuckDB oracles (shared with the raw
  * variants) green in CORRECTNESS. */
class TpchGraftSuite extends SparkFixture {

  private val sf = "/root/testdata/sf0.001"
  private val pairs = Seq(
    "q1_graft" -> "q1_agg",
    "q3_graft" -> "q3_top_orders",
    "q5_graft" -> "q5_region_revenue",
    "q18_graft" -> "q18_large_volume_cust")

  pairs.foreach { case (graftQ, rawQ) =>
    test(s"$graftQ matches $rawQ over the same data") {
      val g = SparkEntry.queries(graftQ)(spark, sf)
      val r = SparkEntry.queries(rawQ)(spark, sf)
      assertSameRows(g, r)
    }
  }

  test("graft variants share their raw twins' oracles") {
    pairs.foreach { case (g, r) =>
      assert(SparkEntry.oracleSql(g) == SparkEntry.oracleSql(r))
    }
  }
}
