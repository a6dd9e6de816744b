package graft

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.meta._
import graft.tables.{GraftTable, GraftTransaction}

/** Multi-table atomic commit through the JDBC catalog: all-or-nothing
  * publish, conflict rollback leaves every table untouched, sorted lock
  * order keeps opposite-order writers deadlock-free, and the file store
  * refuses rather than pretends. */
class GraftTransactionSuite extends SparkFixture {
  import spark.implicits._

  private def jdbc(db: String) =
    new JdbcMetaStore(s"jdbc:derby:memory:$db;create=true")

  private def rows(n: Int, mul: Int) =
    (1 to n).map(i => (i.toLong, i * mul)).toDF("id", "v")

  test("upsertAll lands both tables; contents match the batches") {
    withTempPath { pa => withTempPath { pb =>
      val s = jdbc("txn1")
      val a = GraftTable.create(spark, rows(20, 10), pa,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      val b = GraftTable.create(spark, rows(30, 100), pb,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      GraftTransaction.upsertAll(Seq(
        a -> rows(20, 10).withColumn("v", col("v") * 2),
        b -> rows(5, 100).withColumn("v", col("v") * 3)))
      assertSameRows(a.toDF, rows(20, 20))
      assertSameRows(b.toDF,
        rows(5, 300).unionByName(rows(30, 100).filter(col("id") > 5)))
      s.dropTable(pa); s.dropTable(pb)
    }}
  }

  test("a CAS conflict on one table rolls back EVERY table") {
    withTempPath { pa => withTempPath { pb =>
      val s = jdbc("txn2")
      val a = GraftTable.create(spark, rows(10, 1), pa,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      val b = GraftTable.create(spark, rows(10, 1), pb,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      val headA = s.listPartitionHeads(pa).head
      val commit = DataCommitInfo(MetaStore.newCommitId(),
        headA.partitionDesc, Seq(DataFileInfo("/x/f.parquet", "add", 1L, 0)),
        CommitOp.Merge, 0L)
      val badCommitB = DataCommitInfo(MetaStore.newCommitId(),
        headA.partitionDesc, Seq(DataFileInfo("/x/g.parquet", "add", 1L, 0)),
        CommitOp.Merge, 0L)
      val va = s.listPartitionHeads(pa).map(_.version).max
      val vb = s.listPartitionHeads(pb).map(_.version).max
      intercept[MetaRerunException] {
        s.commitMany(Seq(
          (pa, Seq(commit), Map(headA.partitionDesc -> va)),
          (pb, Seq(badCommitB), Map(headA.partitionDesc -> (vb + 7))))) // stale
      }
      // table A's commit must have rolled back with B's conflict
      assert(s.listPartitionHeads(pa).map(_.version).max == va,
        "table A advanced despite table B's conflict - commitMany not atomic")
      s.dropTable(pa); s.dropTable(pb)
    }}
  }

  test("opposite-order concurrent multi-table writers do not deadlock") {
    withTempPath { pa => withTempPath { pb =>
      val s = jdbc("txn3")
      val a = GraftTable.create(spark, rows(8, 1), pa,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      val b = GraftTable.create(spark, rows(8, 1), pb,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      val n = 6
      val pool = Executors.newFixedThreadPool(2)
      val start = new CountDownLatch(1)
      val errs = new ConcurrentLinkedQueue[Throwable]()
      def worker(order: Seq[(GraftTable, Int)]): Runnable = () => {
        start.await()
        try (1 to n).foreach { _ =>
          GraftTransaction.upsertAll(order.map { case (t, m) =>
            t -> rows(8, 1).withColumn("v", col("v") + m)
          })
        } catch { case e: Throwable => errs.add(e) }
      }
      pool.submit(worker(Seq(a -> 100, b -> 200)))
      pool.submit(worker(Seq(b -> 300, a -> 400))) // reversed table order
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(120, TimeUnit.SECONDS), "deadlock/timeout")
      assert(errs.isEmpty, s"writer failed: ${errs.peek()}")
      // every transaction advanced BOTH tables by the same commit count
      val ha = a.history.size
      val hb = b.history.size
      assert(ha == 1 + 2 * n, s"table A has $ha commits, expect ${1 + 2 * n}")
      assert(hb == 1 + 2 * n, s"table B has $hb commits, expect ${1 + 2 * n}")
      s.dropTable(pa); s.dropTable(pb)
    }}
  }

  test("file store: single entry delegates, several tables refuse") {
    withTempPath { pa => withTempPath { pb =>
      val s = new FileMetaStore
      val a = GraftTable.create(spark, rows(6, 1), pa,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      GraftTransaction.upsertAll(Seq(a -> rows(6, 1).withColumn("v", col("v") * 9)))
      assertSameRows(a.toDF, rows(6, 9))
      val b = GraftTable.create(spark, rows(6, 1), pb,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      intercept[UnsupportedOperationException] {
        GraftTransaction.upsertAll(Seq(a -> rows(2, 1), b -> rows(2, 1)))
      }
      s.dropTable(pa); s.dropTable(pb)
    }}
  }
}
