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

  test("mixed transaction: upsert + delta update + tombstone delete atomically") {
    withTempPath { pa => withTempPath { pb =>
      val s = jdbc("txn5")
      val a = GraftTable.create(spark, rows(10, 1), pa,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      val b = GraftTable.create(spark, rows(10, 1), pb,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      import GraftTransaction._
      GraftTransaction.run(Seq(
        TxUpsert(a, rows(10, 1).withColumn("v", col("v") * 2)),
        TxUpdateDelta(b, col("id") <= 4, Map("v" -> (col("v") + 100))),
        TxDeleteTombstone(b, col("id") <= 2)))
      assertSameRows(a.toDF, rows(10, 2))
      // b: ids 1,2 deleted; 3,4 updated (+100); 5..10 untouched
      assertSameRows(b.toDF,
        Seq((3L, 103), (4L, 104)).toDF("id", "v")
          .unionByName(rows(10, 1).filter(col("id") > 4)))
      // deletion landed as a TOMBSTONE run, not a rewrite
      assert(b.liveFiles.exists(f => Tombstone.isTombstone(f.file)),
        "delete should have staged a tombstone run")
      // one catalog commit per table: create + txn = 2 history entries
      assert(a.history.size == 2 && b.history.size == 2,
        s"expected one txn commit per table: ${a.history.size}/${b.history.size}")
      s.dropTable(pa); s.dropTable(pb)
    }}
  }

  test("several ops on ONE table merge into one entry, folding in op order") {
    withTempPath { pa =>
      val s = jdbc("txn6")
      val a = GraftTable.create(spark, rows(6, 1), pa,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      import GraftTransaction._
      GraftTransaction.run(Seq(
        TxUpsert(a, rows(6, 2)),                       // v = 2i
        TxDeleteTombstone(a, col("id") <= 2),          // drop 1, 2
        TxUpsert(a, Seq((1L, 999)).toDF("id", "v"))))  // revive 1
      assertSameRows(a.toDF,
        Seq((1L, 999)).toDF("id", "v")
          .unionByName(rows(6, 2).filter(col("id") > 2)))
      // ONE atomic commit despite three staged ops
      assert(a.history.size == 2,
        s"three same-table ops must share one commit: ${a.history.size}")
      s.dropTable(pa)
    }
  }

  test("a named conflict re-stages ONLY the conflicted table") {
    withTempPath { pa => withTempPath { pb =>
      // store that fails the FIRST multi-table commit, naming table b as
      // the loser — a's staged files must be reused, b's rewritten
      class FailOnce(url: String) extends JdbcMetaStore(url) {
        @volatile var induced = 0
        override def commitMany(
            entries: Seq[(String, Seq[DataCommitInfo], Map[String, Int])],
            expectedBucketNums: Map[String, Int]): Unit = {
          if (induced == 0 && entries.size > 1) {
            induced += 1
            throw new MetaRerunException("induced conflict", Some(pb))
          }
          super.commitMany(entries, expectedBucketNums)
        }
      }
      val s = new FailOnce("jdbc:derby:memory:txn7;create=true")
      val a = GraftTable.create(spark, rows(8, 1), pa,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      val b = GraftTable.create(spark, rows(8, 1), pb,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      def parquets(p: String): Int = {
        def walk(f: java.io.File): Int =
          if (f.isDirectory) f.listFiles().map(walk).sum
          else if (f.getName.endsWith(".parquet")) 1 else 0
        walk(new java.io.File(p))
      }
      val (a0, b0) = (parquets(pa), parquets(pb))
      GraftTransaction.upsertAll(Seq(a -> rows(8, 3), b -> rows(8, 5)))
      assert(s.induced == 1, "conflict was not induced")
      assertSameRows(a.toDF, rows(8, 3))
      assertSameRows(b.toDF, rows(8, 5))
      val (aN, bN) = (parquets(pa) - a0, parquets(pb) - b0)
      // b staged twice (orphan + live run), a exactly once
      assert(bN == 2 * aN,
        s"expected only b to re-stage: a wrote $aN files, b wrote $bN")
      s.dropTable(pa); s.dropTable(pb)
    }}
  }

  test("sustained contention: concurrent mixed txns retry with backoff and land") {
    withTempPath { pa => withTempPath { pb =>
      val s = jdbc("txn8")
      val a = GraftTable.create(spark, rows(8, 1), pa,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      val b = GraftTable.create(spark, rows(8, 1), pb,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      import GraftTransaction._
      val n = 4
      val pool = Executors.newFixedThreadPool(2)
      val start = new CountDownLatch(1)
      val errs = new ConcurrentLinkedQueue[Throwable]()
      def worker(mul: Int): Runnable = () => {
        start.await()
        try (1 to n).foreach { k =>
          GraftTransaction.run(Seq(
            TxUpsert(a, rows(8, mul * k)),
            TxUpdateDelta(b, col("id") <= 3, Map("v" -> (col("v") + 1)))))
        } catch { case e: Throwable => errs.add(e) }
      }
      pool.submit(worker(10)); pool.submit(worker(100))
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(180, TimeUnit.SECONDS), "timeout")
      assert(errs.isEmpty, s"txn failed under contention: ${errs.peek()}")
      // every transaction advanced both tables exactly once
      assert(a.history.size == 1 + 2 * n && b.history.size == 1 + 2 * n)
      // 2n updates of +1 each applied to ids 1..3 exactly once apiece
      assert(b.toDF.filter(col("id") <= 3).select(sum(col("v"))).head.getLong(0)
        == (1 + 2 + 3) + 3 * 2 * n)
      s.dropTable(pa); s.dropTable(pb)
    }}
  }

  test("crash between staging and commitMany: readers never see partial " +
    "state, vacuum reclaims each table's orphans, the retry lands") {
    withTempPath { pa => withTempPath { pb =>
      class CrashAtPublish(url: String) extends JdbcMetaStore(url) {
        @volatile var crash = false
        override def commitMany(
            entries: Seq[(String, Seq[DataCommitInfo], Map[String, Int])],
            expectedBucketNums: Map[String, Int]): Unit = {
          if (crash) throw new RuntimeException("injected crash at publish")
          super.commitMany(entries, expectedBucketNums)
        }
      }
      val s = new CrashAtPublish("jdbc:derby:memory:txn9;create=true")
      val a = GraftTable.create(spark, rows(12, 1), pa,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      val b = GraftTable.create(spark, rows(12, 1), pb,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      def parquets(p: String): Int = {
        def walk(f: java.io.File): Int =
          if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
          else if (f.getName.endsWith(".parquet")) 1 else 0
        walk(new java.io.File(p))
      }
      val (a0, b0) = (parquets(pa), parquets(pb))
      import GraftTransaction._
      def ops = Seq(
        TxUpsert(a, rows(12, 7)),
        TxUpdateDelta(b, col("id") <= 4, Map("v" -> (col("v") + 100))),
        TxDeleteTombstone(b, col("id") > 10))
      // every op stages its data files, then the single publish dies — the
      // mixed-transaction crash window VERDICTs call out: orphans now span
      // SEVERAL tables
      s.crash = true
      val e = intercept[RuntimeException] { GraftTransaction.run(ops) }
      assert(e.getMessage.contains("injected crash"))
      s.crash = false
      val (aOrphans, bOrphans) = (parquets(pa) - a0, parquets(pb) - b0)
      assert(aOrphans > 0 && bOrphans > 0,
        s"staging must have written files to both tables ($aOrphans/$bOrphans)")
      // no reader ever sees partial state; fsck is clean on both tables
      assertSameRows(a.toDF, rows(12, 1))
      assertSameRows(b.toDF, rows(12, 1))
      assert(a.validate() == Nil && b.validate() == Nil)
      // vacuum on EACH table reclaims exactly its orphans
      assert(a.vacuum(0L) == aOrphans.toLong && b.vacuum(0L) == bOrphans.toLong)
      assert(parquets(pa) == a0 && parquets(pb) == b0)
      assertSameRows(a.toDF, rows(12, 1))
      assertSameRows(b.toDF, rows(12, 1))
      // the crashed transaction retries cleanly (no wedged state)
      GraftTransaction.run(ops)
      assertSameRows(a.toDF, rows(12, 7))
      assertSameRows(b.toDF, (1 to 10)
        .map(i => (i.toLong, if (i <= 4) i + 100 else i)).toDF("id", "v"))
      s.dropTable(pa); s.dropTable(pb)
    }}
  }

  test("crash MID-staging (second table's files half-written): same " +
    "invariants — invisible, sweepable, retryable") {
    withTempPath { pa => withTempPath { pb =>
      import graft.write.TransactionalWrite
      val s = jdbc("txn10")
      val a = GraftTable.create(spark, rows(10, 1), pa,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      val b = GraftTable.create(spark, rows(10, 1), pb,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      import GraftTransaction._
      def ops = Seq(TxUpsert(a, rows(10, 5)), TxUpsert(b, rows(10, 9)))
      // the SECOND stage() dies after its data files hit disk, before any
      // publish — torn staging across tables
      val calls = new java.util.concurrent.atomic.AtomicInteger(0)
      TransactionalWrite.postWriteHook = () =>
        if (calls.incrementAndGet() == 2)
          throw new RuntimeException("injected crash mid-staging")
      try {
        val e = intercept[RuntimeException] { GraftTransaction.run(ops) }
        assert(e.getMessage.contains("mid-staging"))
      } finally TransactionalWrite.postWriteHook = () => ()
      assertSameRows(a.toDF, rows(10, 1))
      assertSameRows(b.toDF, rows(10, 1))
      assert(a.validate() == Nil && b.validate() == Nil)
      assert(a.vacuum(0L) + b.vacuum(0L) > 0, "orphans must be sweepable")
      GraftTransaction.run(ops)
      assertSameRows(a.toDF, rows(10, 5))
      assertSameRows(b.toDF, rows(10, 9))
      s.dropTable(pa); s.dropTable(pb)
    }}
  }

  test("concurrent MIXED txns sharing one table (upsert+delete folds) " +
    "converge under CAS contention") {
    withTempPath { pa => withTempPath { pb =>
      val s = jdbc("txn11")
      val a = GraftTable.create(spark, rows(8, 1), pa,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      val b = GraftTable.create(spark, rows(8, 1), pb,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      import GraftTransaction._
      val n = 3
      val pool = Executors.newFixedThreadPool(2)
      val start = new CountDownLatch(1)
      val errs = new ConcurrentLinkedQueue[Throwable]()
      def batch(base: Long) = (0 until 10)
        .map(j => (base + j, 1)).toDF("id", "v")
      // worker 1: upsert into a + delta-update shared b
      val w1: Runnable = () => {
        start.await()
        try (1 to n).foreach { k =>
          GraftTransaction.run(Seq(
            TxUpsert(a, rows(8, 10 * k)),
            TxUpdateDelta(b, col("id") <= 3, Map("v" -> (col("v") + 1)))))
        } catch { case e: Throwable => errs.add(e) }
      }
      // worker 2: upsert 10 fresh ids into shared b and tombstone-delete
      // the lower 5 of the PREVIOUS iteration's batch in the same
      // transaction (staged ops read the txn-START snapshot, so a delete
      // can only target rows that existed before the transaction)
      val w2: Runnable = () => {
        start.await()
        try (1 to n).foreach { k =>
          val base = 1000L + k * 100
          val prev = 1000L + (k - 1) * 100
          GraftTransaction.run(Seq(
            TxUpsert(b, batch(base)),
            TxDeleteTombstone(b, col("id") >= prev && col("id") < prev + 5)))
        } catch { case e: Throwable => errs.add(e) }
      }
      pool.submit(w1); pool.submit(w2)
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(180, TimeUnit.SECONDS), "timeout")
      assert(errs.isEmpty, s"txn failed under contention: ${errs.peek()}")
      assertSameRows(a.toDF, rows(8, 10 * n))
      // b: base rows with ids 1..3 incremented n times; batches 1..n-1
      // lost their lower 5 to the NEXT iteration's delete; batch n intact
      val expB = (1 to 8).map(i => (i.toLong, if (i <= 3) i + n else i))
        .toDF("id", "v")
        .unionByName((1 to n).flatMap { k =>
          val keep = if (k < n) 5 until 10 else 0 until 10
          keep.map(j => (1000L + k * 100 + j, 1)) }.toDF("id", "v"))
      assertSameRows(b.toDF, expB)
      assert(b.validate() == Nil)
      s.dropTable(pa); s.dropTable(pb)
    }}
  }

  test("randomized mixed-transaction sequences with crash injection match " +
    "an in-memory model (stage-time snapshots, per-table fold order)") {
    withTempPath { pa => withTempPath { pb =>
      class CrashingStore(url: String) extends JdbcMetaStore(url) {
        @volatile var crash = false
        override def commitMany(
            entries: Seq[(String, Seq[DataCommitInfo], Map[String, Int])],
            expectedBucketNums: Map[String, Int]): Unit = {
          if (crash) throw new RuntimeException("injected crash at publish")
          super.commitMany(entries, expectedBucketNums)
        }
      }
      val s = new CrashingStore("jdbc:derby:memory:txn12;create=true")
      val seed = System.nanoTime()
      val rnd = new scala.util.Random(seed)
      info(s"model-check seed = $seed")

      val a = GraftTable.create(spark, rows(20, 1), pa,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      val b = GraftTable.create(spark, rows(20, 2), pb,
        hashColumns = Seq("id"), bucketNum = 2, store = s)
      val tables = Map(pa -> a, pb -> b)
      // model state per table: id -> v (Int, matching rows()'s schema)
      val model = scala.collection.mutable.Map(
        pa -> scala.collection.mutable.Map((1L to 20L).map(i => i -> i.toInt): _*),
        pb -> scala.collection.mutable.Map((1L to 20L).map(i => i -> i.toInt * 2): _*))

      import GraftTransaction._
      // an op = (TxOp, model effect computed against the txn-START state,
      // applied in op order — mirroring staged-snapshot + fold semantics)
      type Effect = (String, Map[Long, Int], Set[Long]) // table, upserts, deletes
      def randOp(): (TxOp, Effect) = {
        val p = if (rnd.nextBoolean()) pa else pb
        val t = tables(p)
        val s0 = model(p).toMap // txn-start snapshot (model mutates per txn)
        rnd.nextInt(3) match {
          case 0 =>
            val ids = (0 until (1 + rnd.nextInt(6)))
              .map(_ => 1L + rnd.nextInt(30)).distinct
            val v = rnd.nextInt(1000)
            (TxUpsert(t, ids.map(i => (i, v + i.toInt)).toDF("id", "v")),
              (p, ids.map(i => i -> (v + i.toInt)).toMap, Set.empty[Long]))
          case 1 =>
            val cut = 1L + rnd.nextInt(30)
            val add = 1 + rnd.nextInt(9)
            (TxUpdateDelta(t, col("id") <= cut, Map("v" -> (col("v") + add))),
              (p, s0.collect { case (i, v) if i <= cut => i -> (v + add) },
                Set.empty[Long]))
          case _ =>
            val lo = 1L + rnd.nextInt(30)
            val hi = lo + rnd.nextInt(5)
            (TxDeleteTombstone(t, col("id") >= lo && col("id") <= hi),
              (p, Map.empty[Long, Int],
                s0.keySet.filter(i => i >= lo && i <= hi)))
        }
      }

      var crashes = 0
      (1 to 14).foreach { _ =>
        val nOps = 1 + rnd.nextInt(3)
        val opsAndEffects = (0 until nOps).map(_ => randOp())
        // a txn whose every op stages nothing (no-match delete/update)
        // never reaches commitMany, so the crash hook cannot fire on it
        val effective = opsAndEffects.exists { case (_, (_, ups, dels)) =>
          ups.nonEmpty || dels.nonEmpty }
        val doCrash = effective && rnd.nextDouble() < 0.3
        if (doCrash) {
          s.crash = true
          intercept[RuntimeException] {
            GraftTransaction.run(opsAndEffects.map(_._1))
          }
          s.crash = false
          crashes += 1 // model untouched: the txn must be invisible
        } else {
          GraftTransaction.run(opsAndEffects.map(_._1))
          // apply effects in op order; each was computed against the
          // txn-start snapshot (randOp captured s0 when built, which is
          // exactly the pre-txn state since we only mutate here)
          opsAndEffects.foreach { case (_, (p, ups, dels)) =>
            dels.foreach(model(p).remove)
            ups.foreach { case (i, v) => model(p)(i) = v }
          }
        }
      }

      Seq(pa, pb).foreach { p =>
        val exp = model(p).toSeq.map { case (i, v) => (i, v) }
          .toDF("id", "v")
        assertSameRows(tables(p).toDF, exp)
        assert(tables(p).validate() == Nil, s"fsck dirty for $p (seed $seed)")
      }
      assert(crashes == 0 || (a.vacuum(0L) + b.vacuum(0L)) > 0,
        s"$crashes crashed txns must have left sweepable orphans (seed $seed)")
      Seq(pa, pb).foreach { p =>
        assertSameRows(tables(p).toDF,
          model(p).toSeq.map { case (i, v) => (i, v) }.toDF("id", "v"))
      }
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
