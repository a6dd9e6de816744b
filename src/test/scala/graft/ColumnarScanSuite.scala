package graft

/** DSv2 columnar fast path (GraftPartitionReaderFactory): merge-free scans
  * — a compacted PK table, or one never upserted — stream the vectorized
  * reader's ColumnarBatches straight to Spark (BatchScanExec goes columnar,
  * plan shows ColumnarToRow); any pending multi-run bucket drops the whole
  * scan back to the row-based merge path with identical results. */
class ColumnarScanSuite extends SparkFixture {

  private def useCatalog(wh: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.catalog.GraftCatalogV2")
    spark.conf.set("spark.graft.warehouse", wh)
  }

  test("single-run table scans columnar; pending deltas fall back to rows") {
    withTempPath { wh =>
      useCatalog(wh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.cs")
      try {
        spark.sql("CREATE TABLE graft_cat.cs.t (id BIGINT, v STRING) " +
          "PARTITIONED BY (bucket(2, id))")
        spark.sql("INSERT INTO graft_cat.cs.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")

        // freshly written: one run per bucket -> columnar end-to-end
        val fresh = spark.sql("SELECT * FROM graft_cat.cs.t")
        assert(fresh.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
          s"expected a columnar scan:\n${fresh.queryExecution.executedPlan}")
        assertRows(fresh, Seq("[1,a]", "[2,b]", "[3,c]"))

        // a second run pends -> the scan must merge, so it goes row-based
        spark.sql("INSERT INTO graft_cat.cs.t VALUES (2, 'b2')")
        val pending = spark.sql("SELECT * FROM graft_cat.cs.t")
        assert(!pending.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
          s"merge-pending scan must be row-based:\n${pending.queryExecution.executedPlan}")
        assertRows(pending, Seq("[1,a]", "[2,b2]", "[3,c]"))

        // compaction collapses to one run -> columnar again, merged values
        spark.sql("CALL graft.compaction(table_name => 'cs.t')")
        val compacted = spark.sql("SELECT * FROM graft_cat.cs.t")
        assert(compacted.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
          s"compacted scan should be columnar:\n${compacted.queryExecution.executedPlan}")
        assertRows(compacted, Seq("[1,a]", "[2,b2]", "[3,c]"))
      } finally spark.sql("DROP TABLE IF EXISTS graft_cat.cs.t")
    }
  }

  test("CDC tables never scan columnar: delete markers must filter even " +
    "in a merge-free state") {
    withTempPath { wh =>
      useCatalog(wh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.cs")
      try {
        spark.sql("CREATE TABLE graft_cat.cs.cdc (id BIGINT, v STRING, op STRING) " +
          "PARTITIONED BY (bucket(2, id)) " +
          "TBLPROPERTIES ('graft.cdc.column'='op')")
        // ONE commit carrying a delete marker: every bucket is a single
        // non-tombstone run (merge-free), but the scan still owes the
        // cdc != 'delete' filter — the columnar fast path would stream the
        // batch unfiltered and resurface id=3.
        spark.sql("INSERT INTO graft_cat.cs.cdc VALUES " +
          "(1, 'a', 'insert'), (2, 'b', 'insert'), (3, 'c', 'delete')")
        val scan = spark.sql("SELECT * FROM graft_cat.cs.cdc")
        assert(!scan.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
          s"CDC scan must stay row-based (per-row delete filter):\n" +
            s"${scan.queryExecution.executedPlan}")
        assertRows(scan, Seq("[1,a,insert]", "[2,b,insert]"))
      } finally spark.sql("DROP TABLE IF EXISTS graft_cat.cs.cdc")
    }
  }
}
