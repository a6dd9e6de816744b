package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.MaterializedView
import graft.pipeline.MaterializedView.Measure
import graft.tables.GraftTable

/** Phase-level timing of the `mview_mutable` gate body at a chosen scale
  * factor — the 100x ratio alone cannot say WHICH pass is the steep one
  * (create write? the delta update's predicate scan? a refresh diff?).
  * Prints one line per phase at the replicated scale so optimization
  * effort lands where the seconds are.
  *
  * args: [sfDir] [factor] (defaults /root/testdata/sf0.1, 100) */
object MviewPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(100)

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-mview-phase-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val big = ProbeTmp.dir("graft-mviewphase-")
    val reps = explode(lit((0 until factor).toArray)).as("rep")
    spark.read.parquet(s"$sfDir/orders.parquet").select(col("*"), reps)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * 1000000000L)
      .drop("rep")
      .repartition(32).write.mode("overwrite").parquet(s"$big/orders.parquet")

    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val o = spark.read.parquet(s"$big/orders.parquet")
    val base = ProbeTmp.dir("graft-mviewphase-t-")
    val srcPath = s"$base/src"; val viewPath = s"$base/view"
    val src = timed("create source (full write)") {
      GraftTable.create(spark, o, srcPath,
        hashColumns = Seq("o_orderkey"), bucketNum = 4,
        properties = Map("graft.update.mode" -> "delta",
          "graft.delete.mode" -> "tombstone"))
    }
    timed("mview create") {
      MaterializedView.create(spark, srcPath, viewPath,
        keys = Seq("o_orderstatus"),
        measures = Seq(
          Measure("total", "CAST(o_totalprice AS DECIMAL(18,2))", "sum"),
          Measure("cnt", "1", "count")),
        mutable = true)
    }
    timed("refresh 1 (backfill)") { MaterializedView.refresh(spark, viewPath) }
    timed("delta update (%5)") {
      src.update(col("o_orderkey") % 5 === 0,
        Map("o_totalprice" -> (col("o_totalprice") * 2)))
    }
    timed("refresh 2 (diff fold)") { MaterializedView.refresh(spark, viewPath) }
    timed("tombstone delete (%7)") { src.delete("o_orderkey % 7 = 0") }
    timed("tombstone delete (status P)") {
      src.delete(col("o_orderstatus") === "P")
    }
    timed("refresh 3 (diff fold)") { MaterializedView.refresh(spark, viewPath) }
    timed("view read") {
      println("rows = " + MaterializedView.read(spark, viewPath).count())
    }
    spark.stop()
  }
}
