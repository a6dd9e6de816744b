package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tables.GraftTable

/** Where does the MOR read's time go? Builds a PK table with K delta runs
  * (new-key batches, 1% overlap) and times, over the same files:
  *   raw    — plain parquet union scan of every live file, sum(val)
  *            (no merge semantics; the vectorized floor)
  *   mor    — the bucket k-way merge read, sum(val)
  *   morcnt — the merge read, count() (no downstream agg on values)
  * The (mor - raw) gap is pure merge-path overhead: per-row iterator
  * dispatch + loser tree + UnsafeProjection. args: [initRows] [runs]
  * [rowsPerRun] (defaults 2M / 50 / 40k). */
object MergeCostProbe {
  def main(args: Array[String]): Unit = {
    val initRows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nRuns = args.lift(1).map(_.toInt).getOrElse(50)
    val perRun = args.lift(2).map(_.toLong).getOrElse(40000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def min3(body: => Unit): Double = Seq.fill(3)(time(body)).min

    def rows(start: Long, n: Long) = spark.range(start, start + n)
      .select(col("id"), (col("id") % 997 * 3.5).as("val"),
        concat(lit("payload-"), col("id") % 100000).as("tag"))

    val dir = ProbeTmp.dir("graft-mergecost-")
    val t = GraftTable.create(spark, rows(0, initRows), dir,
      hashColumns = Seq("id"), bucketNum = 32)
    (1 to nRuns).foreach { i =>
      t.upsert(rows(initRows + (i - 1).toLong * perRun, perRun)
        .union(rows((i * 1009L) % initRows, perRun / 100)
          .withColumn("val", col("val") + i)))
    }
    val paths = t.liveFiles.map(_.file.path)
    println(s"files=${paths.size} " +
      s"runs=${t.liveFiles.map(_.commitOrdinal).distinct.size}")
    val raw = spark.read.parquet(paths: _*)
    raw.agg(sum(col("val"))).collect() // warm
    t.toDF.agg(sum(col("val"))).collect() // warm (build merge JIT)
    val tRaw = min3 { raw.agg(sum(col("val"))).collect() }
    val tMor = min3 { t.toDF.agg(sum(col("val"))).collect() }
    val tMorCnt = min3 { t.toDF.count() }
    val totalRows = initRows + nRuns * (perRun + perRun / 100)
    println(f"[mergecost] raw=$tRaw%.2fs mor=$tMor%.2fs morcnt=$tMorCnt%.2fs " +
      f"rows=$totalRows merge_overhead=${(tMor - tRaw) / tRaw}%.1fx " +
      f"ns_per_row=${(tMor - tRaw) * 1e9 / totalRows * 32}%.0f (per-thread)")
    spark.stop()
  }
}
