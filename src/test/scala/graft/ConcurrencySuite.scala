package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.spark.sql.functions._
import graft.tables.GraftTable

/** Optimistic-commit correctness under concurrency (SURVEY.md §7.5 hard
  * part: MetaRerunException retry path, TransactionCommit.scala:398-427). */
class ConcurrencySuite extends SparkFixture {
  import spark.implicits._

  test("concurrent upserts all land (CAS retry), no lost updates") {
    withTempPath { path =>
      val t = GraftTable.create(spark, Seq((0, 0)).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 2)
      val n = 6
      val pool = Executors.newFixedThreadPool(n)
      val start = new CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      (1 to n).foreach { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            try GraftTable.forPath(spark, path)
              .upsert(Seq((i, i * 10)).toDF("id", "v"))
            catch { case e: Throwable => errs.add(e) }
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(120, TimeUnit.SECONDS))
      assert(errs.isEmpty, s"concurrent upserts failed: ${errs.peek()}")
      // every writer's row is present
      assertRows(t.toDF.select("id", "v"),
        (0 to n).map(i => s"[$i,${i * 10}]"))
      // version advanced once per committed upsert
      assert(t.partitions.head.version == n)
    }
  }

  test("concurrent clause-merges (copy-on-write) all land via CAS retry") {
    withTempPath { path =>
      import graft.tables.{GraftMerge, MergeMatchedClause, MergeNotMatchedClause}
      val t = GraftTable.create(spark,
        (1 to 20).map(i => (i.toLong, 0.0)).toDF("id", "bal"), path,
        hashColumns = Seq("id"), bucketNum = 2)
      val n = 4
      val pool = Executors.newFixedThreadPool(n)
      val start = new CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      (1 to n).foreach { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            // each writer bumps a DISJOINT id range and inserts one new key,
            // so the merged end state is exact regardless of interleaving
            try GraftTable.forPath(spark, path).mergeIntoClauses(
              Seq((i * 5L - 4, 1.0), (i * 5L - 3, 1.0), (100L + i, 7.0))
                .toDF("k", "amt"),
              Map("id" -> "k"),
              matched = Seq(MergeMatchedClause(None, Some(Map(
                "bal" -> (GraftMerge.target("bal") + GraftMerge.source("amt")))))),
              notMatched = Seq(MergeNotMatchedClause(None, Map(
                "id" -> GraftMerge.source("k"),
                "bal" -> GraftMerge.source("amt")))))
            catch { case e: Throwable => errs.add(e) }
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(180, TimeUnit.SECONDS))
      assert(errs.isEmpty, s"concurrent merges failed: ${errs.peek()}")
      assert(t.toDF.count() == 20 + n)
      assert(t.toDF.filter(col("bal") === 1.0).count() == 2 * n)
      assert(t.toDF.filter(col("id") > 100).count() == n)
    }
  }

  test("compaction racing concurrent upserts never loses a delta") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        (0 until 100).map(i => (i.toLong, 0L)).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val upserter = new Thread(() => {
        try (1 to 8).foreach { k =>
          t.upsert((0 until 100).map(i => (i.toLong, k.toLong)).toDF("id", "v"))
        } catch { case e: Throwable => errs.add(e) }
      })
      upserter.start()
      // compaction reads snapshot S and rewrites; any upsert landing after S
      // must force a CAS retry, never be swallowed by the rewrite commit
      try (1 to 4).foreach { _ => t.compaction(); Thread.sleep(10) }
      catch { case e: Throwable => errs.add(e) }
      upserter.join(120000)
      assert(errs.isEmpty, s"racing ops failed: ${errs.peek()}")
      val got = t.toDF.select("id", "v").as[(Long, Long)].collect().toMap
      assert(got == (0 until 100).map(i => i.toLong -> 8L).toMap,
        "last upsert's values must survive every compaction interleaving")
    }
  }

  test("DDL: addColumn + setProperties visible to readers") {
    withTempPath { path =>
      val t = GraftTable.create(spark, Seq((1, "a")).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 1)
      t.addColumn("score", org.apache.spark.sql.types.IntegerType)
      assertRows(t.toDF, Seq("[1,a,null]"))
      t.upsert(Seq((2, "b", 9)).toDF("id", "v", "score"))
      assertRows(t.toDF, Seq("[1,a,null]", "[2,b,9]"))
      t.setProperties(Map("graft.custom" -> "x"))
      assert(t.info.properties("graft.custom") == "x")
      t.unsetProperty("graft.custom")
      assert(!t.info.properties.contains("graft.custom"))
    }
  }
}
