package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._
import graft.tables.GraftTable

/** r16 zero-shuffle compaction pin: when every (partition, bucket) group
  * reads through the bucket merge, compaction's write keeps the read's
  * per-group placement — no bucket re-shuffle (at 100 TB the removed
  * shuffle is a second full pass of the table over the network). r17: the
  * alignment flag is produced by GraftRead.readTracked's own dispatch (no
  * mirror predicate to drift), but the pins stay: if a group is silently
  * routed to the plain scan while the write still skips its shuffle,
  * either the shuffle-bytes pin or the result/row-order pins here fail. */
class CompactionShuffleSuite extends SparkFixture {

  private def shuffleBytesDuring(body: => Unit): Long = {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(l)
    // drain the async listener bus deterministically before reading the
    // counter (ADVICE r16: a fixed sleep undercounts on a loaded host,
    // letting the sb==0 pin pass spuriously). LiveListenerBus
    // .waitUntilEmpty is private[spark] = public in bytecode, so invoke it
    // reflectively; fall back to polling the counter stable if the method
    // moves.
    try {
      body
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case _: Throwable =>
        val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
        var prev = -1L
        while (prev != bytes.get() && System.nanoTime() < deadline) {
          prev = bytes.get()
          Thread.sleep(100)
        }
      }
    } finally spark.sparkContext.removeSparkListener(l)
    bytes.get()
  }

  test("full compaction of an all-delta table writes zero shuffle bytes") {
    withTempPath { dir =>
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val t = GraftTable.create(spark, orders, dir,
        hashColumns = Seq("o_orderkey"), bucketNum = 4)
      val batch = orders.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      t.upsert(batch)
      t.upsert(batch.withColumn("o_totalprice", col("o_totalprice") + 1))
      val before = t.toDF.collect().map(_.toString).sorted.toSeq
      val sb = shuffleBytesDuring { t.compaction() }
      assert(sb == 0L, s"aligned compaction shuffled $sb bytes")
      // one file per touched bucket, still a single sorted run
      val byBucket = t.liveFiles.groupBy(_.file.bucketId)
      assert(byBucket.values.forall(_.size == 1),
        s"expected one file per bucket, got ${byBucket.view.mapValues(_.size).toMap}")
      assert(t.toDF.collect().map(_.toString).sorted.toSeq == before)
      // post-compaction reads (now single-run groups) stay correct: a
      // fresh upsert + read exercises the k-way merge over the
      // skip-shuffle-written run, which only works if per-file pk order
      // survived the aligned write
      t.upsert(batch.withColumn("o_totalprice", col("o_totalprice") + 5))
      assert(t.toDF.count() == orders.count())
    }
  }

  test("re-bucketing compaction still re-shuffles (rows genuinely move)") {
    withTempPath { dir =>
      val orders = spark.read.parquet(s"$sfDir/orders.parquet").limit(5000)
      val t = GraftTable.create(spark, orders, dir,
        hashColumns = Seq("o_orderkey"), bucketNum = 2)
      t.upsert(orders.limit(1000).withColumn("o_totalprice", lit(1.0)))
      val before = t.toDF.collect().map(_.toString).sorted.toSeq
      val sb = shuffleBytesDuring {
        t.compaction(graft.tables.CompactionOptions(newBucketNum = Some(4)),
          _ => true)
      }
      assert(sb > 0L, "re-bucket compaction must move rows across buckets")
      assert(t.liveFiles.forall(_.file.bucketId < 4))
      assert(t.toDF.collect().map(_.toString).sorted.toSeq == before)
    }
  }

  test("leveled compaction with a plain-scan group keeps the shuffle") {
    withTempPath { dir =>
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val t = GraftTable.create(spark, orders, dir,
        hashColumns = Seq("o_orderkey"), bucketNum = 4)
      // readTracked must refuse a set with single-run groups: a bucket
      // the deltas never touched reads through the plain scan
      val tiny = orders.limit(1) // one key -> one bucket touched
      t.upsert(tiny.withColumn("o_totalprice", lit(2.0)))
      val files = t.liveFiles
      assert(!graft.read.GraftRead.readTracked(spark, t.info, files,
        keepCdcRows = true)._2)
      val before = t.toDF.collect().map(_.toString).sorted.toSeq
      t.compaction()
      assert(t.toDF.collect().map(_.toString).sorted.toSeq == before)
    }
  }
}
