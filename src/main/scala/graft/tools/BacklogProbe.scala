package graft.tools

import org.apache.spark.sql.SparkSession

/** Measure streaming admission-control planning cost over a deep commit
  * backlog: a paced latestOffset must decode metadata proportional to the
  * admitted batch, not the backlog. Builds an N-commit table, then times
  * (a) the bounded boundary scan vs the unbounded one, (b) a paced
  * AvailableNow drain.
  *
  * args: [nCommits] (default 400)
  */
object BacklogProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(400)
    val dir = ProbeTmp.dir("graft-backlog")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-backlog-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.sql.catalog.graft_cat", "graft.catalog.GraftCatalogV2")
      .config("spark.graft.warehouse", dir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val path = s"$dir/backlog_t"
    val t0 = System.nanoTime()
    val t = graft.tables.GraftTable.create(spark,
      Seq((0L, "v0")).toDF("id", "v"), path,
      hashColumns = Seq("id"), bucketNum = 1)
    (1 to n).foreach(i => t.upsert(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    println(f"built $n-commit backlog in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def time[A](what: String)(body: => A): A = {
      val s = System.nanoTime(); val r = body
      println(f"$what: ${(System.nanoTime() - s) / 1e6}%.1f ms"); r
    }
    val last = t.lastCommitTs
    // cold vs warm, bounded vs unbounded boundary scans
    graft.tables.GraftTable.uncached(path)
    time(s"commitBatches cold, cap=8")(t.commitBatches(0L, last, 8))
    time(s"commitBatches warm, cap=8")(t.commitBatches(0L, last, 8))
    time(s"commitBatches warm, uncapped (all $n)")(t.commitBatches(0L, last))
    time(s"commitBatches warm, cap=8 again")(t.commitBatches(0L, last, 8))

    // paced drain: 8 commits per trigger -> ~n/8 batches
    graft.catalog.GraftCatalog.register(spark, "probe.backlog", path)
    val s1 = System.nanoTime()
    val q = spark.readStream.option("maxCommitsPerTrigger", "8")
      .table("graft_cat.probe.backlog")
      .writeStream.format("memory").queryName("backlog_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(600000)
    val batches = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    println(f"paced drain: ${batches.length} batches, ${
      spark.table("backlog_out").count()} rows in ${
      (System.nanoTime() - s1) / 1e9}%.1f s")
    spark.stop()
  }
}
