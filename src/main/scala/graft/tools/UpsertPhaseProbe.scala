package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.GraftTable

/** r16: where does an upsert's wall time go? Wraps the bench's MOR upsert
  * loop with a job listener: per upsert we get (wall, sum of Spark job
  * spans, job count) — the difference wall - jobs is driver-side work
  * (plan/normalize/preMerge analysis, file listing, meta commit).
  *
  * Usage: runMain graft.tools.UpsertPhaseProbe [nUpserts]
  */
object UpsertPhaseProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 10
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

    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    @volatile var jobSpans = List.empty[(Long, Long)] // (start, end) ns-ish ms
    @volatile var stages = List.empty[(String, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStarts.put(js.jobId, js.time)
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = jobStarts.getOrDefault(je.jobId, je.time)
        jobSpans = (s, je.time) :: jobSpans
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        stages = (i.name.takeWhile(_ != '(').trim + "#" + i.numTasks,
          i.submissionTime.getOrElse(0L), i.completionTime.getOrElse(0L),
          i.taskMetrics.executorRunTime) :: stages
      }
    })

    // Catalyst phase breakdown per executed query (analysis/optimization/
    // planning ms from the QueryPlanningTracker)
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        val ph = qe.tracker.phases.map { case (k, v) =>
          s"$k=${v.endTimeMs - v.startTimeMs}" }.mkString(" ")
        println(f"[upp]    qe $funcName dur=${durationNs / 1e9}%.3f $ph")
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    // warmup table (JIT the whole path, like Bench)
    locally {
      val wt = GraftTable.create(spark, orders.limit(20000),
        ProbeTmp.dir("graft-upp-warm-"), hashColumns = Seq("o_orderkey"),
        bucketNum = cpus)
      (1 to 2).foreach(_ => wt.upsert(orders.limit(5000)))
      wt.toDF.count()
    }
    val t = GraftTable.create(spark, orders, ProbeTmp.dir("graft-upp-"),
      hashColumns = Seq("o_orderkey"), bucketNum = cpus)
    val batch = orders.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    batch.cache().count()

    (1 to n).foreach { i =>
      jobSpans = Nil
      val w0 = System.currentTimeMillis()
      val t0 = System.nanoTime()
      t.upsert(batch)
      val w1 = System.currentTimeMillis()
      val wall = (System.nanoTime() - t0) / 1e9
      // merge overlapping job spans so concurrent jobs don't double-count
      val spans = jobSpans.sortBy(_._1)
      var merged = List.empty[(Long, Long)]
      spans.foreach { case (s, e) =>
        merged match {
          case (ms, me) :: rest if s <= me => merged = (ms, math.max(me, e)) :: rest
          case _ => merged = (s, e) :: merged
        }
      }
      val jobMs = merged.map { case (s, e) => e - s }.sum
      // driver split: preJob = upsert start -> first job submit (store read
      // + normalize/preMerge analysis + write-plan compile); postJob = last
      // job end -> upsert return (file listing + stats attach + meta CAS);
      // betweenJobs = driver gaps between jobs (AQE barriers etc.)
      val preJob = if (spans.nonEmpty) (spans.map(_._1).min - w0) / 1e3 else 0.0
      val postJob = if (spans.nonEmpty) (w1 - spans.map(_._2).max) / 1e3 else 0.0
      println(f"[upp] upsert $i%2d wall=$wall%.3f jobs=${jobMs / 1e3}%.3f " +
        f"driver=${wall - jobMs / 1e3}%.3f (pre=$preJob%.3f post=$postJob%.3f) " +
        f"njobs=${spans.size}")
      stages.reverse.foreach { case (n, s, e, rt) =>
        println(f"[upp]    stage $n wall=${(e - s) / 1e3}%.3f taskSum=${rt / 1e3}%.3f")
      }
      stages = Nil
    }
    spark.stop()
  }
}
