package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.GraftTable

/** Scratch perf probe: decomposes the MOR-read time into (a) raw parquet
  * scan floor over the same file set, (b) bucket-merge read, (c) compacted
  * read — to see whether merge CPU or file-open overhead dominates. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s ($r)")
    }
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-probe-").toFile.getAbsolutePath
    val t = GraftTable.create(spark, orders, dir,
      hashColumns = Seq("o_orderkey"), bucketNum = 32)
    val batch = orders.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    batch.cache().count()
    (1 to 10).foreach(_ => t.upsert(batch))
    batch.unpersist()
    val files = t.liveFiles.map(_.file.path)
    println(s"[probe] files = ${files.size}")
    time("warm job")(spark.range(1000000L).count())
    time("plain scan ALL delta files, count")(
      spark.read.parquet(files: _*).count())
    time("plain scan ALL delta files, full-width collect-count")(
      spark.read.parquet(files: _*).select(sum(length(col("o_orderstatus")))).collect()(0))
    time("merged read 1")(t.toDF.count())
    time("merged read 2")(t.toDF.count())
    t.compaction()
    time("compacted read 1")(t.toDF.count())
    time("compacted read 2")(t.toDF.count())
    spark.stop()
  }
}
