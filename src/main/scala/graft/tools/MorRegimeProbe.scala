package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.GraftTable

/** r16 A/B: the bench's MOR regime (create -> 10 upserts -> read ->
  * compaction), two arms alternated whole-regime so host drift hits both.
  * Arm "on" = shipped config; arm "off" = the chosen boolean engine conf
  * forced false (default spark.graft.write.planCache; pass any
  * spark.graft.* key as the second arg, e.g.
  * spark.graft.write.flatBucketWrite) — measures that conf's share of the
  * per-commit cost. Earlier revisions A/B'd footer stats (~5%) and the
  * inert-write AQE skip (~10%) the same way.
  *
  * Usage: runMain graft.tools.MorRegimeProbe [rounds] [confKey]
  */
object MorRegimeProbe {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 3
    // comma-separated keys are toggled together (interaction A/B)
    val confKeys = args.lift(1).getOrElse("spark.graft.write.planCache")
      .split(',').toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val batch = orders.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    batch.cache().count()
    // warmup
    locally {
      val wt = GraftTable.create(spark, orders.limit(20000),
        ProbeTmp.dir("graft-mrp-warm-"), hashColumns = Seq("o_orderkey"),
        bucketNum = cpus)
      (1 to 2).foreach(_ => wt.upsert(orders.limit(5000)))
      wt.toDF.count()
    }
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val res = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    (1 to rounds).foreach { _ =>
      Seq("on", "off").foreach { arm =>
        confKeys.foreach(k => spark.conf.set(k, (arm == "on").toString))
        val createT = time {
          val t = GraftTable.create(spark, orders,
            ProbeTmp.dir(s"graft-mrp-$arm-"),
            hashColumns = Seq("o_orderkey"), bucketNum = cpus)
          res(s"upsert_med_$arm") =
            median((1 to 10).map(_ => time(t.upsert(batch)))) :: res(s"upsert_med_$arm")
          res(s"read_$arm") = time(t.toDF.count()) :: res(s"read_$arm")
          res(s"compaction_$arm") = time(t.compaction()) :: res(s"compaction_$arm")
        }
        res(s"lifecycle_$arm") = createT :: res(s"lifecycle_$arm")
      }
      confKeys.foreach(spark.conf.unset)
    }
    res.toSeq.sortBy(_._1).foreach { case (k, ts) =>
      println(f"[mrp] $k%-18s med=${median(ts)}%.3f all=${ts.reverse.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
