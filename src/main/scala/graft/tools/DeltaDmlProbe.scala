package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tables.GraftTable

/** Asymptotic check for the rewrite-free DML family: as the table grows,
  * the copy-on-write paths scale with TABLE size (every targeted file is
  * rewritten) while tombstone deletes / delta updates scale with MATCHED
  * rows. Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.DeltaDmlProbe"
  * (optional arg: replication factor, default 10). */
object DeltaDmlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val base = spark.read.parquet(s"$sfDir/orders.parquet")
    // replicate with disjoint key ranges so PKs stay unique
    val big = (0 until factor).map { i =>
      base.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L))
    }.reduce(_ unionByName _)
    val rows = big.count()
    // ~0.1% of rows, spread over every file (un-prunable predicate)
    val pred = col("o_orderkey") % 1009 === 0

    def fresh(tag: String) = GraftTable.create(spark, big,
      java.nio.file.Files.createTempDirectory(s"graft-dmlprobe-$tag-")
        .toFile.getAbsolutePath,
      hashColumns = Seq("o_orderkey"), bucketNum = cpus)

    // warmup both paths on a small table
    locally {
      val w = GraftTable.create(spark, base.limit(20000),
        java.nio.file.Files.createTempDirectory("graft-dmlprobe-warm-")
          .toFile.getAbsolutePath,
        hashColumns = Seq("o_orderkey"), bucketNum = cpus)
      w.deleteTombstone(pred)
      w.delete(col("o_orderkey") % 1013 === 0)
      w.updateDelta(col("o_orderkey") % 1019 === 0,
        Map("o_totalprice" -> (col("o_totalprice") * 1.1)))
      w.update(col("o_orderkey") % 1021 === 0,
        Map("o_totalprice" -> (col("o_totalprice") * 1.1)))
    }

    val matched = big.filter(pred).count()
    println(f"table rows = $rows%,d (factor $factor), matched = $matched%,d")

    // bytes written by the op = live bytes added (the write-amplification
    // axis: at object-store latencies and 100 TB this is the cost that
    // scales, not the local-SSD wall clock)
    def written(t: GraftTable)(body: => Unit): Long = {
      val before = t.liveFiles.map(_.file.path).toSet
      body
      t.liveFiles.filterNot(f => before.contains(f.file.path)).map(_.file.size).sum
    }

    val t1 = fresh("tomb")
    var wTomb = 0L
    val dTomb = time { wTomb = written(t1) { t1.deleteTombstone(pred) } }
    val rTomb = time { t1.toDF.count() }
    val t2 = fresh("rw")
    var wRw = 0L
    val dRw = time { wRw = written(t2) { t2.delete(pred) } }
    val rRw = time { t2.toDF.count() }
    println(f"DELETE   tombstone = $dTomb%.2f s, ${wTomb / 1e6}%.1f MB written " +
      f"(read $rTomb%.2f) vs rewrite = $dRw%.2f s, ${wRw / 1e6}%.1f MB " +
      f"(read $rRw%.2f)  -> ${dRw / dTomb}%.1fx time, ${wRw.toDouble / math.max(wTomb, 1)}%.0fx bytes")

    val uset = Map("o_totalprice" -> (col("o_totalprice") * 1.1))
    val t3 = fresh("ud")
    var wuD = 0L
    val uDelta = time { wuD = written(t3) { t3.updateDelta(pred, uset) } }
    val ruD = time { t3.toDF.count() }
    val t4 = fresh("ur")
    var wuR = 0L
    val uRw = time { wuR = written(t4) { t4.update(pred, uset) } }
    val ruR = time { t4.toDF.count() }
    println(f"UPDATE   delta     = $uDelta%.2f s, ${wuD / 1e6}%.1f MB written " +
      f"(read $ruD%.2f) vs rewrite = $uRw%.2f s, ${wuR / 1e6}%.1f MB " +
      f"(read $ruR%.2f)  -> ${uRw / uDelta}%.1fx time, ${wuR.toDouble / math.max(wuD, 1)}%.0fx bytes")

    spark.stop()
  }
}
