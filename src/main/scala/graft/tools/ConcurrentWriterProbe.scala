package graft.tools

import org.apache.spark.sql.SparkSession

import graft.tables.GraftTable

/** Child-JVM writer for the cross-process commit-arbitration test
  * (ConcurrencySuite): upserts `n` batches into an existing graft table from
  * its own SparkSession/driver. Two of these running concurrently reproduce
  * the reference's multi-writer scenario (TransactionCommit.scala:398-427 —
  * conflicting commits are detected and the loser reruns on fresh state);
  * here the embedded FS meta store arbitrates with an OS file lock + the
  * per-partition version CAS, and [[GraftTable]]'s retry reruns the loser.
  *
  * args: tablePath writerId nUpserts
  *
  * Each batch writes 10 writer-disjoint keys plus the SHARED key 42 (forced
  * same-partition contention), then the process exits 0 only if every
  * upsert committed. */
object ConcurrentWriterProbe {
  def main(args: Array[String]): Unit = {
    val Array(tablePath, writerStr, nStr) = args.take(3)
    val writer = writerStr.toInt
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-concurrent-writer-$writer")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      val t = GraftTable.forPath(spark, tablePath)
      (1 to n).foreach { i =>
        val rows = Seq.tabulate(10)(j =>
          (writer * 100000L + i * 100L + j, s"w$writer-b$i")) :+
          (42L, s"w$writer-b$i") // contended key: both writers race on it
        t.upsert(rows.toDF("k", "v"))
      }
    } finally spark.stop()
  }
}
