package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.GraftTable

/** r17: phase breakdown of the bench's stream_window_agg entry — is the
  * ~2 s genuinely Structured Streaming machinery (state store / commit
  * logs / progress) or compute we can still shape? Prints the in-query
  * source-table build time, the streaming wall, micro-batch count and
  * each batch's durationMs map from the progress events.
  *
  * Usage: runMain graft.tools.StreamPhaseProbe [reps]
  */
object StreamPhaseProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def dec(c: String) = col(c).cast("decimal(18,2)")

    // untimed streaming warmup (same as Bench)
    locally {
      val root = ProbeTmp.dir("graft-spp-warm-")
      val e = spark.read.parquet(s"$sfDir/events.parquet").limit(200)
        .withColumn("ts", col("ts").cast("timestamp"))
      GraftTable.create(spark, e, s"$root/src")
      val q = spark.readStream.format("graft").load(s"$root/src")
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
        .writeStream.format("graft").outputMode("append")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .option("queryId", "spp-warm")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }

    (1 to reps).foreach { i =>
      val root = ProbeTmp.dir("graft-spp-")
      val e = spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", col("ts").cast("timestamp"))
      val tCreate = time { GraftTable.create(spark, e, s"$root/src") }
      val agg = spark.readStream.format("graft").load(s"$root/src")
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec("value")).cast("double").as("sum_value"))
        .select(unix_micros(col("window").getField("start")).as("hour_start"),
          col("event_type"), col("n"), col("sum_value"))
      var q: org.apache.spark.sql.streaming.StreamingQuery = null
      val tStream = time {
        q = agg.writeStream.format("graft")
          .outputMode("update")
          .option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .option("hashPartitions", "hour_start,event_type")
          .option("queryId", s"spp-$i")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(120000)
      }
      println(f"[spp] rep $i create=$tCreate%.2f stream=$tStream%.2f")
      q.recentProgress.foreach { p =>
        println(s"[spp]   batch ${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs}")
      }
    }
    spark.stop()
  }
}
