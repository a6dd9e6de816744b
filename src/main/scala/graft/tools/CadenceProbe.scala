package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tables.GraftTable
import graft.write.FileStatsCollector

/** Temporary diagnosis: per-op timings of the cadenced upsert+compaction
  * regime, with file-stats collection on vs off. */
object CadenceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-cadence-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROBE_AQE", "false"))
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val batch = orders.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    batch.cache().count()

    Seq(("stats_on", Map.empty[String, String]),
      ("stats_off", Map(FileStatsCollector.EnabledProp -> "false"))).foreach {
      case (label, props) =>
        val dir = ProbeTmp.dir("graft-cad-")
        var t: GraftTable = null
        println(f"[$label] create: ${time { t = GraftTable.create(spark, orders, dir, hashColumns = Seq("o_orderkey"), bucketNum = 32, properties = props) }}%.2f s")
        // mimic the bench order: 10 plain upserts, reads, full compaction,
        // reads, THEN the cadenced regime
        println(f"[$label] upsert_10x: ${time((1 to 10).foreach(_ => t.upsert(batch)))}%.2f s")
        println(f"[$label] read_10_deltas: ${time(t.toDF.count())}%.2f s")
        println(f"[$label] compaction: ${time(t.compaction())}%.2f s")
        println(f"[$label] read_compacted: ${time(t.toDF.count())}%.2f s")
        println(f"[$label] read_compacted2: ${time(t.toDF.count())}%.2f s")
        val cad = time {
          (1 to 10).foreach { i =>
            val u = time(t.upsert(batch))
            var c = 0.0
            if (i % 4 == 0) c = time(t.compaction())
            println(f"[$label]   cad $i: upsert $u%.2f s compact $c%.2f s")
          }
        }
        println(f"[$label] cadenced_10x: $cad%.2f s")
        println(f"[$label] read_cadenced: ${time(t.toDF.count())}%.2f s")
    }
    spark.stop()
  }
}
