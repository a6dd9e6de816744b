package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tables.GraftTable

/** Kernel-vs-join probe for the snapshot diff (CDF): builds a bucketed
  * lineitem-scale PK table, applies an update + delete + upsert mix, then
  * times the ZERO-SHUFFLE bucket kernel against the full-outer-join form on
  * the identical version pair (min of 3 each, correctness cross-checked
  * row-for-row first). */
object DiffProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(body: => Any): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[diffprobe] $tag: min ${ts.min}%.3f s (runs ${ts.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.range(1000000L).count() // warm

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("lid", col("l_orderkey") * 10 + col("l_linenumber"))
    val dir = java.nio.file.Files.createTempDirectory("graft-diffprobe-")
      .toFile.getAbsolutePath
    val t = GraftTable.create(spark, li, dir,
      hashColumns = Seq("lid"), bucketNum = 32)
    val ts1 = t.lastCommitTs
    t.update(col("lid") % 5 === 0, Map("l_quantity" -> (col("l_quantity") + 1)))
    t.delete("lid % 11 = 0 AND lid % 5 <> 0")
    t.upsert(li.filter(col("lid") % 13 === 0)
      .withColumn("l_quantity", col("l_quantity") * 2))
    val ts2 = t.lastCommitTs

    val kernel = t.diff(ts1, ts2)
    val joined = t.diffViaJoin(ts1, ts2)
    val nk = kernel.count(); val nj = joined.count()
    require(nk == nj && kernel.exceptAll(joined).isEmpty
      && joined.exceptAll(kernel).isEmpty,
      s"kernel ($nk rows) and join ($nj rows) forms disagree")
    println(s"[diffprobe] rows=$nk over ${li.count()} source rows; " +
      "forms agree row-for-row")
    time("diff kernel (zero-shuffle)")(kernel.count())
    time("diff via full-outer join")(joined.count())
    spark.stop()
  }
}
