package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of named SparkEntry queries — the
  * "would this plan survive 100 TB" review loop (broadcast vs shuffle join
  * choice, pushed filters, exchange count, codegen spans).
  *
  * args: sfDir query1,query2,...
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-plan-audit")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n======== $n ========")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      // AQE finalizes exchange reuse at runtime — the static plan may show
      // duplicated subtrees that execute once (ReusedExchange)
      df.collect()
      println(s"-------- $n executed (AQE-final) --------")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
