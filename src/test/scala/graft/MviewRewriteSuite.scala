package graft

import org.apache.spark.sql.functions._

import graft.pipeline.MaterializedView
import graft.pipeline.MaterializedView.Measure
import graft.tables.GraftTable

class MviewRewriteSuite extends SparkFixture {
  import spark.implicits._

  private def facts(n: Int, offset: Int = 0) =
    (offset until offset + n).map(i =>
      (i.toLong, s"k${i % 3}", i * 1.5)).toDF("id", "k", "v")

  private def planOf(sql: String): String =
    spark.sql(sql).queryExecution.optimizedPlan.toString

  test("fresh view answers matching aggregates; staleness falls back") {
    withTempPath { dir =>
      spark.conf.set("spark.sql.catalog.graft_cat", "graft.catalog.GraftCatalogV2")
      spark.conf.set("spark.graft.warehouse", s"$dir/wh")
      facts(60).createOrReplaceTempView("rw_src_in")
      spark.sql("CREATE TABLE graft_cat.rw.src AS SELECT * FROM rw_src_in")
      val srcPath = graft.catalog.GraftCatalog.resolve(spark, "rw.src").get
      MaterializedView.create(spark, srcPath, s"$dir/view",
        keys = Seq("k"), measures = Seq(
          Measure("total", "v", "sum"),
          Measure("cnt", "1", "count"),
          Measure("vmax", "v", "max")))
      MaterializedView.refresh(spark, s"$dir/view")
      MaterializedView.enableRewrite(spark, s"$dir/view")
      try {
        val q = "SELECT k, SUM(v) AS total, COUNT(*) AS cnt, MAX(v) AS vmax " +
          "FROM graft_cat.rw.src GROUP BY k"
        // rewritten: no aggregate left in the plan, no source scan
        val plan = planOf(q)
        assert(!plan.contains("Aggregate"), s"not rewritten:\n$plan")
        assertSameRows(spark.sql(q),
          facts(60).groupBy("k").agg(sum($"v").as("total"),
            count(lit(1)).as("cnt"), max($"v").as("vmax")))

        // non-matching shapes keep the source aggregate (never wrong)
        assert(planOf("SELECT k, SUM(v + 1) FROM graft_cat.rw.src GROUP BY k")
          .contains("Aggregate"))
        assert(planOf("SELECT k, COUNT(DISTINCT v) FROM graft_cat.rw.src GROUP BY k")
          .contains("Aggregate"))
        assert(planOf("SELECT id, SUM(v) FROM graft_cat.rw.src GROUP BY id")
          .contains("Aggregate"))

        // ROLLUP: group keys a strict subset of the view keys (and the
        // global aggregate) re-aggregate the view instead of the source;
        // casts around aggregates are re-applied on top
        val roll = "SELECT CAST(SUM(v) AS DOUBLE) AS total, COUNT(*) AS cnt " +
          "FROM graft_cat.rw.src"
        val rollPlan = planOf(roll)
        // the rewrite must re-aggregate the VIEW, not the source table
        // (view reads are RelationV2 too now that toDF routes through DSv2,
        // so assert on the scanned identifier, not the node type)
        assert(!rollPlan.contains("rw.src"),
          s"rollup still scans the source:\n$rollPlan")
        assert(rollPlan.contains("view"),
          s"rollup should scan the materialized view:\n$rollPlan")
        assertSameRows(spark.sql(roll),
          facts(60).agg(sum($"v").cast("double").as("total"),
            count(lit(1)).as("cnt")))

        // FILTER matching: a filtered view answers only the identically-
        // filtered query; the unfiltered view refuses filtered queries
        MaterializedView.create(spark, srcPath, s"$dir/fview",
          keys = Seq("k"), measures = Seq(Measure("cnt", "1", "count")),
          filter = Some("v > 30"))
        MaterializedView.refresh(spark, s"$dir/fview")
        MaterializedView.enableRewrite(spark, s"$dir/fview")
        val fq = "SELECT k, COUNT(*) AS cnt FROM graft_cat.rw.src " +
          "WHERE v > 30 GROUP BY k"
        assert(!planOf(fq).contains("rw.src"), "filtered view not used")
        assertSameRows(spark.sql(fq),
          facts(60).filter($"v" > 30).groupBy("k")
            .agg(count(lit(1)).as("cnt")))
        // different predicate -> no rewrite
        assert(planOf("SELECT k, COUNT(*) FROM graft_cat.rw.src " +
          "WHERE v > 31 GROUP BY k").contains("rw.src"))
        MaterializedView.disableRewrite(spark, s"$dir/fview")

        // staleness: a new source commit disables the rewrite until refresh
        GraftTable.forPath(spark, srcPath).append(facts(30, offset = 60))
        assert(planOf(q).contains("Aggregate"), "stale view still rewrote")
        assertSameRows(spark.sql(q),
          facts(90).groupBy("k").agg(sum($"v").as("total"),
            count(lit(1)).as("cnt"), max($"v").as("vmax")))
        MaterializedView.refresh(spark, s"$dir/view")
        assert(!planOf(q).contains("Aggregate"), "refreshed view not rewriting")
        assertSameRows(spark.sql(q),
          facts(90).groupBy("k").agg(sum($"v").as("total"),
            count(lit(1)).as("cnt"), max($"v").as("vmax")))
      } finally MaterializedView.disableRewrite(spark, s"$dir/view")
    }
  }
}
