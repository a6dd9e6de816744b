package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16: where do the ~100 ms/task of a bucketed commit's write stage go?
  * Writes the bench's upsert batch (30k rows, 32 buckets) through
  * variants: with/without dynamic partitionBy, codecs, with/without the
  * task-side stats commit protocol. Reports reduce-stage task-time sums.
  *
  * Usage: runMain graft.tools.WriteCostProbe [reps]
  */
object WriteCostProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var taskSum = 0L
    @volatile var wall32 = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (sc.stageInfo.numTasks == 32) {
          taskSum += sc.stageInfo.taskMetrics.executorRunTime
          wall32 += sc.stageInfo.completionTime.getOrElse(0L) -
            sc.stageInfo.submissionTime.getOrElse(0L)
        }
    })
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val batch = orders.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("__b", pmod(hash(col("o_orderkey")), lit(32)))
      .repartition(32, col("__b"))
      .sortWithinPartitions(col("__b"), col("o_orderkey"))
    batch.cache().count()

    def run(name: String)(body: String => Unit): Unit = {
      body(ProbeTmp.dir(s"graft-wcp-warm-") + "/out") // warm
      taskSum = 0L; wall32 = 0L
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => body(ProbeTmp.dir(s"graft-wcp-") + "/out"))
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[wcp] $name%-28s wall/rep=${wall / reps}%.3f " +
        f"taskSum/rep=${taskSum / 1e3 / reps}%.3f stageWall/rep=${wall32 / 1e3 / reps}%.3f")
    }

    run("partitionBy+snappy") { d =>
      batch.write.partitionBy("__b").parquet(d)
    }
    run("partitionBy+none") { d =>
      batch.write.option("compression", "none").partitionBy("__b").parquet(d)
    }
    run("partitionBy+zstd") { d =>
      batch.write.option("compression", "zstd").partitionBy("__b").parquet(d)
    }
    run("flat+snappy") { d =>
      batch.write.parquet(d)
    }
    run("flat+snappy+ts_micros") { d =>
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      try batch.write.parquet(d)
      finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    run("flat+snappy+nodict") { d =>
      batch.write.option("parquet.enable.dictionary", "false").parquet(d)
    }
    spark.stop()
  }
}
