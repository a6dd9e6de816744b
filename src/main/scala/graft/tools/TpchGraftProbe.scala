package graft.tools

import org.apache.spark.sql.SparkSession

/** Format-tax probe (VERDICT r5 #2): times the graft-format TPC-H variants
  * (q1/q3/q5/q18 over graft tables — PK-bucketed dimensions + plain
  * lineitem) against their raw-parquet twins on the same sf dir, steady
  * state (median of 3 after one warm pass), and prints the per-query ratio.
  * Also prints the q1_graft physical plan so the scan shape (pushed
  * filters, pruned read schema, no stray exchange) is auditable. */
object TpchGraftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def median3(body: => Unit): Double = {
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }

    val pairs = Seq(
      "q1_graft" -> "q1_agg",
      "q3_graft" -> "q3_top_orders",
      "q5_graft" -> "q5_region_revenue",
      "q18_graft" -> "q18_large_volume_cust")

    // one warm pass each: builds the graft tables (untimed here) + JITs
    pairs.foreach { case (g, r) =>
      graft.SparkEntry.queries(g)(spark, sfDir).count()
      graft.SparkEntry.queries(r)(spark, sfDir).count()
    }
    println("--- q1_graft plan (formatted) ---")
    graft.SparkEntry.queries("q1_graft")(spark, sfDir).explain("formatted")

    pairs.foreach { case (g, r) =>
      val tg = median3 { graft.SparkEntry.queries(g)(spark, sfDir).count() }
      val tr = median3 { graft.SparkEntry.queries(r)(spark, sfDir).count() }
      println(f"[tpch-graft] $g: graft=$tg%.3f s raw=$tr%.3f s ratio=${tg / tr}%.2fx")
    }
    spark.stop()
  }
}
