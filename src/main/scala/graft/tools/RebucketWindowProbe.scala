package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tables.{CompactionOptions, GraftTable}

/** Scale probe for the r15 cursor-split window read: an incremental window
  * spanning a RE-BUCKET, measured through BOTH read paths on the same
  * synthesized table —
  *
  *  - SPLIT (default): each mapping-consistent sub-window reads
  *    bucket-parallel; one shuffle of just the old-epoch delta into the
  *    final mapping ([[graft.read.BucketMergeRead.readSplitWindow]]).
  *  - CROSS (forced via the plan-time toggle): the pre-r15 fallback —
  *    one k-way merge task per RANGE PARTITION, i.e. ONE task total on
  *    this unpartitioned table, regardless of cores.
  *
  * The table deliberately scales past the gate data (default 4M + 2x2M
  * incremental rows, the 100x shape of the sf0.01 bench entry) because the
  * thing under test is the parallelism CLIFF: the cross path's wall-clock
  * is bound by one core's merge throughput while the split path divides by
  * bucketNum. Results land in README's r15 paragraph.
  *
  * args: [initRows] [rowsPerUpsert] [oldBuckets] [newBuckets]
  * (defaults 4M / 2M / 16 / 32). Prints one summary line. */
object RebucketWindowProbe {
  def main(args: Array[String]): Unit = {
    val initRows = args.lift(0).map(_.toLong).getOrElse(4000000L)
    val perUpsert = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val oldN = args.lift(2).map(_.toInt).getOrElse(16)
    val newN = args.lift(3).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .appName("graft-rebucket-window-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def rows(n: Long, base: Long, tag: Int) =
      spark.range(n).select((col("id") + base).as("k"),
        (col("id") % 997).cast("double").as("v"),
        concat(lit(s"t$tag-"), col("id") % 1000).as("pad"))

    val dir = ProbeTmp.dir("graft-rebucket-window-probe-")
    val t = GraftTable.create(spark, rows(initRows, 0, 0), dir,
      hashColumns = Seq("k"), bucketNum = oldN)
    val w0 = t.lastCommitTs
    Thread.sleep(1100) // step past the re-bucket clock cushion
    t.upsert(rows(perUpsert, initRows, 1)) // old-mapping delta
    Thread.sleep(1100)
    t.compaction(CompactionOptions(newBucketNum = Some(newN)), _ => true)
    Thread.sleep(1100)
    t.upsert(rows(perUpsert, initRows + perUpsert, 2)) // new-mapping delta
    val w1 = t.lastCommitTs

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // sum(v), not count(): a count can answer from metadata
    def readWindow(): Unit =
      t.incremental(w0, w1).agg(sum("v")).collect()

    readWindow() // untimed warmup (JIT + page cache, split path)
    val split = Seq.fill(3)(time(readWindow())).min
    graft.read.GraftRead.forceCrossBucketRead = true
    val cross = try Seq.fill(3)(time(readWindow())).min
    finally graft.read.GraftRead.forceCrossBucketRead = false
    val n = t.incremental(w0, w1).count()
    println(f"""{"probe":"rebucket_window","rows":$n,"init":$initRows,""" +
      f""""per_upsert":$perUpsert,"old_buckets":$oldN,"new_buckets":$newN,""" +
      f""""split_sec":$split%.2f,"cross_sec":$cross%.2f,""" +
      f""""speedup":${cross / split}%.1f}""")
    spark.stop()
  }
}
