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

  test("q9/q21 graft twins never plan MORE exchanges than their raw twins " +
    "(r15: the join-heavy pair's format tax stays plan-pinned, not just " +
    "timing-pinned)") {
    // The twins' ≤1.1x bench ratio rests on the graft scans joining exactly
    // like the raw scans do — dimensions broadcast, the big sides reuse the
    // scan's reported partitioning (SPJ / KeyGroupedPartitioning) instead
    // of re-shuffling. A catalog or Spark-upgrade regression that makes the
    // DSv2 scan stop reporting stats or partitioning shows up as EXTRA
    // Exchange nodes on the graft side long before it shows up as a 1.5x
    // bench drift — fail here instead.
    // DISTINCT shuffle shapes, not raw node count: the DSv2 scan accepts
    // runtime filters, so the initial plan carries dynamic-pruning
    // SUBQUERY copies of a subtree (dup Exchange nodes with identical
    // shapes) that AQE's exchange reuse collapses at runtime — counting
    // nodes would flag those copies while missing nothing real. A genuine
    // reintroduced shuffle has a NEW partitioning shape.
    def shuffleShapes(q: String): Set[String] =
      SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
        .split("\n").filter(_.contains("Exchange hashpartitioning"))
        .map(_.replaceAll("#\\d+L?", "#x").replaceAll("plan_id=\\d+", "")
          .replaceAll("^[^E]*Exchange", "Exchange").trim)
        .toSet
    Seq("q9_graft" -> "q9_product_profit",
        "q21_graft" -> "q21_waiting_suppliers").foreach { case (g, r) =>
      val (gs, rs) = (shuffleShapes(g), shuffleShapes(r))
      assert(gs.size <= rs.size,
        s"$g plans shuffle shapes $gs vs $r's $rs — the graft catalog " +
          "reintroduced a shuffle the raw plan doesn't pay")
    }
    // and the PK-bucketed big table keeps REPORTING its partitioning: the
    // SPJ zero-exchange property itself stays pinned end-to-end by
    // BucketedJoinSuite's co-bucketed join plans; here we pin that the
    // TPC-H twins' orders scan still advertises it (the precondition)
    val plan9 = SparkEntry.queries("q9_graft")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan9.contains("GraftScan"), s"q9_graft lost the DSv2 scan:\n$plan9")
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
