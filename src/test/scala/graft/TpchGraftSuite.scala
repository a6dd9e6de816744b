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
}
