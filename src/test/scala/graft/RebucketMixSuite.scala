package graft

import graft.tables.{CompactionOptions, GraftTable}

/** Re-bucketing safety: a partition left at the OLD bucket count cannot
  * merge with deltas bucketed under the new one (keys land in different
  * per-bucket groups — duplicate/resurrected rows), so a scoped re-bucket
  * is refused loudly, and a whole-table re-bucket keeps every key
  * merge-correct through later upserts and compactions. */
class RebucketMixSuite extends SparkFixture {
  import spark.implicits._

  test("condition-scoped re-bucketing is rejected loudly") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        (1 to 20).map(i => (i.toLong, s"p${i % 2}", i)).toDF("id", "part", "v"),
        path, rangeColumns = Seq("part"), hashColumns = Seq("id"), bucketNum = 1)
      val e = intercept[IllegalArgumentException](
        t.compaction("part = 'p0'", CompactionOptions(newBucketNum = Some(4))))
      assert(e.getMessage.contains("every partition"), e.getMessage)
      assert(t.info.bucketNum == 1, "a refused re-bucket must not change bucketNum")
      // same-bucketNum "re-bucket" stays a plain scoped compaction
      t.compaction("part = 'p0'", CompactionOptions(newBucketNum = Some(1)))
      assert(t.toDF.count() == 20)
    }
  }

  test("re-bucketing a table with no live partitions still updates bucketNum") {
    withTempPath { path =>
      import org.apache.spark.sql.types._
      val sch = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", IntegerType)))
      val t = GraftTable.createEmpty(spark, sch, path,
        hashColumns = Seq("id"), bucketNum = 1)
      t.compaction(CompactionOptions(newBucketNum = Some(4)), _ => true)
      assert(t.info.bucketNum == 4,
        "empty-table re-bucket must not silently keep the old bucket count")
      // the next write buckets under the NEW count and still merges
      t.upsert((1 to 8).map(i => (i.toLong, i)).toDF("id", "v"))
      t.upsert(Seq((3L, 333)).toDF("id", "v"))
      assert(t.toDF.count() == 8)
      assert(t.toDF.filter($"id" === 3L).select("v")
        .collect().map(_.getInt(0)).toSeq == Seq(333))
    }
  }

  test("empty-table re-bucket racing a first write: every interleave converges") {
    // end-to-end twin of the store-level CAS test: one thread re-buckets a
    // just-created empty PK table while another lands its first upsert.
    // Whichever wins, the loser's CAS fires and its retry converges —
    // bucketNum ends at the target, the data is complete, and a follow-up
    // upsert of the same keys MERGES (the duplicate-key mixed-bucket state
    // this race used to be able to plant can no longer exist).
    import java.util.concurrent.CountDownLatch
    for (round <- 1 to 6) {
      withTempPath { path =>
        import org.apache.spark.sql.types._
        val sch = StructType(Seq(
          StructField("id", LongType, nullable = false),
          StructField("v", IntegerType)))
        val t = GraftTable.createEmpty(spark, sch, path,
          hashColumns = Seq("id"), bucketNum = 1)
        val start = new CountDownLatch(1)
        val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        def thread(body: => Unit) = {
          val th = new Thread(() => {
            start.await()
            try body catch { case e: Throwable => errs.add(e) }
          })
          th.start(); th
        }
        val writer = thread {
          t.upsert((1 to 32).map(i => (i.toLong, i)).toDF("id", "v"))
        }
        val rebucketer = thread {
          t.compaction(CompactionOptions(newBucketNum = Some(4)), _ => true)
        }
        start.countDown()
        writer.join(120000); rebucketer.join(120000)
        assert(errs.isEmpty, s"round $round: ${errs.peek()}")
        assert(t.info.bucketNum == 4, s"round $round: bucketNum")
        assert(t.toDF.count() == 32, s"round $round: first write complete")
        // the mixed-bucket failure mode: a same-key upsert must MERGE
        t.upsert((1 to 32).map(i => (i.toLong, i * 100)).toDF("id", "v"))
        assert(t.toDF.count() == 32, s"round $round: no duplicate keys")
        assert(t.toDF.filter($"id" === 7L).select("v")
          .collect().map(_.getInt(0)).toSeq == Seq(700), s"round $round: merged")
        assert(t.validate() == Nil, s"round $round: fsck")
      }
    }
  }

  test("stream-batch commit with a stale plan-time bucketNum fails terminally") {
    // the streaming sink's files are bucketed at PLAN time; a concurrent
    // re-bucket cannot be healed by retrying the commit (the files exist),
    // so the bucket CAS converts to a terminal error that forces a stream
    // restart + re-plan — and the unrecorded batchId keeps exactly-once
    withTempPath { path =>
      val t = GraftTable.create(spark,
        (1 to 10).map(i => (i.toLong, i)).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 2)
      val rf = t.liveFiles.head
      val files = Seq((rf.partitionDesc, rf.file))
      val e = intercept[IllegalStateException] {
        t.commitStreamBatch("qx", 1, files, truncate = false,
          writtenBucketNum = Some(99))
      }
      assert(e.getMessage.contains("re-plan"), e.getMessage)
      // the failed epoch was never recorded: the replay with the CORRECT
      // plan-time count lands (same keys re-merge to the same 10 rows)
      t.commitStreamBatch("qx", 1, files, truncate = false,
        writtenBucketNum = Some(2))
      assert(t.toDF.count() == 10)
    }
  }

  test("whole-table re-bucketing: later upserts into every partition still merge") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        (1 to 20).map(i => (i.toLong, s"p${i % 2}", i)).toDF("id", "part", "v"),
        path, rangeColumns = Seq("part"), hashColumns = Seq("id"), bucketNum = 1)
      t.upsert((1 to 20).filter(_ % 2 == 0)
        .map(i => (i.toLong, s"p${i % 2}", i * 10)).toDF("id", "part", "v"))
      t.compaction(CompactionOptions(newBucketNum = Some(4)), _ => true)
      assert(t.info.bucketNum == 4)
      // upsert AFTER the bucket change: same key must merge, never duplicate
      t.upsert(Seq((1L, "p1", 999)).toDF("id", "part", "v"))
      assert(t.toDF.filter($"id" === 1L).select("v")
        .collect().map(_.getInt(0)).toSeq == Seq(999))
      t.compaction()
      assert(t.toDF.filter($"id" === 1L).select("v")
        .collect().map(_.getInt(0)).toSeq == Seq(999))
      assert(t.toDF.count() == 20)
    }
  }

  test("DOWN-re-bucket of a table carrying tombstone runs rewrites cleanly " +
    "and stays exact (r15 soak find)") {
    // The count flips BEFORE the rewrite, so the rewrite's own read (and
    // any concurrent snapshot read) sees old-mapping files whose bucket
    // ids EXCEED the new, smaller count. The id bound in the k-way-merge
    // gate used to reject them, dropping the read to the aggregate
    // fallback — which cannot serve tombstone runs (crash) and pays a
    // shuffle even when it can. The grouping count now widens to the
    // observed ids (the set is mapping-consistent, so raw-id grouping is
    // exact).
    withTempPath { path =>
      val t = GraftTable.create(spark,
        (1 to 40).map(i => (i.toLong, s"a$i")).toDF("id", "data"), path,
        hashColumns = Seq("id"), bucketNum = 6)
      t.upsert((1 to 10).map(i => (i.toLong, s"b$i")).toDF("id", "data"))
      t.deleteTombstone($"id" <= 5L) // tombstone runs present
      // 6 -> 2: every live file's id (0..5) exceeds the new count mid-op
      t.compaction(CompactionOptions(newBucketNum = Some(2)), _ => true)
      assert(t.toDF.count() == 35)
      assert(t.toDF.filter($"id" === 7L).select("data")
        .as[String].collect().toSeq == Seq("b7"))
      assert(t.info.bucketNum == 2)
      assert(t.liveFiles.forall(_.file.bucketId < 2))
      assert(t.validate() == Nil)
      // post-re-bucket writes merge under the new mapping
      t.upsert(Seq((7L, "c7"), (2L, "revived")).toDF("id", "data"))
      assert(t.toDF.count() == 36)
      assert(t.toDF.filter($"id" === 7L).select("data")
        .as[String].collect().toSeq == Seq("c7"))
      assert(t.validate() == Nil)
    }
  }
}
