package graft

import org.apache.spark.sql.functions._

import graft.tables.GraftTable

/** APPLY CHANGES INTO: folding a diff change feed into another table as one
  * atomic commit (upsert delta + tombstone run) — table replication with
  * O(changed rows) cost per cycle. */
class ApplyChangesSuite extends SparkFixture {
  import spark.implicits._

  test("replicating via diff + applyChanges converges under random ops") {
    withTempPath { dir =>
      val rnd = new scala.util.Random(11)
      val init = (1L to 40L).map(i => (i, s"v$i", i * 1.0)).toDF("id", "v", "w")
      val a = GraftTable.create(spark, init, s"$dir/a",
        hashColumns = Seq("id"), bucketNum = 2)
      val b = GraftTable.create(spark, init, s"$dir/b",
        hashColumns = Seq("id"), bucketNum = 3) // bucket layout may differ
      var cursor = a.lastCommitTs

      def state(t: GraftTable): Map[Long, (String, Double)] =
        t.toDF.as[(Long, String, Double)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap

      for (step <- 1 to 6) {
        rnd.nextInt(4) match {
          case 0 => a.upsert(rnd.shuffle((1L to 60L).toList).take(8)
            .map(i => (i, s"s$step-$i", i + step * 0.5)).toDF("id", "v", "w"))
          case 1 => a.deleteTombstone(col("w") > rnd.nextInt(50))
          case 2 => a.delete(col("id") % (2 + rnd.nextInt(5)) === 0) // rewrite tier
          case 3 => a.updateDelta(col("id") % 3 === 0,
            Map("v" -> lit(s"u$step")))
        }
        Thread.sleep(5)
        val now = System.currentTimeMillis()
        b.applyChanges(a.diff(cursor, now))
        cursor = now
        assert(state(b) == state(a), s"step $step: replica diverged")
      }
    }
  }

  test("applyChanges is one atomic commit and is replay-idempotent") {
    withTempPath { dir =>
      val init = (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "w")
      val b = GraftTable.create(spark, init, s"$dir/b",
        hashColumns = Seq("id"), bucketNum = 2)
      val changes = Seq(
        (5L, 99.0, "update_postimage"),
        (5L, 5.0, "update_preimage"), // must be ignored
        (21L, 21.0, "insert"),
        (7L, 7.0, "delete")).toDF("id", "w", "_change_type")
      val before = b.liveFiles.map(_.file.path).toSet
      b.applyChanges(changes)
      assert(before.subsetOf(b.liveFiles.map(_.file.path).toSet),
        "applyChanges must not rewrite data files")
      def check(): Unit = {
        val got = b.toDF.as[(Long, Double)].collect().toMap
        assert(!got.contains(7L))
        assert(got(5L) == 99.0 && got(21L) == 21.0 && got.size == 20)
      }
      check()
      b.applyChanges(changes) // replay: same change batch lands on same state
      check()
    }
  }

  test("replicateFrom: resumable cursor, initial backfill, crash replay converges") {
    withTempPath { dir =>
      val a = GraftTable.create(spark,
        (1L to 30L).map(i => (i, i * 1.0)).toDF("id", "w"), s"$dir/a",
        hashColumns = Seq("id"), bucketNum = 2)
      // EMPTY replica: first replicateFrom backfills the snapshot (cursor 0)
      val b = GraftTable.create(spark,
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          a.schema), s"$dir/b", hashColumns = Seq("id"), bucketNum = 2)
      def state(t: GraftTable): Map[Long, Double] =
        t.toDF.as[(Long, Double)].collect().toMap
      val c1 = b.replicateFrom(a)
      assert(state(b) == state(a) && state(b).size == 30)
      assert(b.replicateFrom(a) == c1, "no new commits -> cursor unchanged")
      // mutate the source, pull again
      Thread.sleep(5)
      a.deleteTombstone(col("id") <= 5L)
      a.upsert(Seq((31L, 31.0)).toDF("id", "w"))
      val c2 = b.replicateFrom(a)
      assert(c2 > c1 && state(b) == state(a))
      // crash simulation: cursor rolled back to c1 -> the window replays,
      // replay-idempotence converges to the same state
      b.setProperties(Map(GraftTable.ReplicaCursorProp -> c1.toString))
      assert(b.replicateFrom(a) == c2 && state(b) == state(a))
    }
  }

  test("txn tokens make retried job versions no-ops") {
    withTempPath { dir =>
      val t = GraftTable.create(spark, Seq((1L, "a")).toDF("id", "v"), dir,
        hashColumns = Seq("id"), bucketNum = 2)
      assert(t.txn("loader", 1) { t.upsert(Seq((2L, "b")).toDF("id", "v")) })
      // orchestrator retry of version 1: body must NOT run
      assert(!t.txn("loader", 1) { t.upsert(Seq((9L, "dup")).toDF("id", "v")) })
      assert(t.txn("loader", 2) { t.upsert(Seq((3L, "c")).toDF("id", "v")) })
      // a different app id has its own sequence
      assert(t.txn("other", 1) { () })
      assert(t.toDF.count() == 3)
      assert(!t.txn("loader", 2) { () } && !t.txn("loader", 1) { () })
    }
  }

  test("secondary index refresh folds tombstone deletes") {
    withTempPath { dir =>
      import graft.tables.SecondaryIndex
      val src = GraftTable.create(spark,
        (1L to 40L).map(i => (i, i % 4)).toDF("id", "grp"), s"$dir/src",
        hashColumns = Seq("id"), bucketNum = 2)
      SecondaryIndex.create(spark, s"$dir/src", s"$dir/idx", "grp", bucketNum = 2)
      SecondaryIndex.refresh(spark, s"$dir/idx")
      assert(SecondaryIndex.lookup(spark, s"$dir/idx", 1).count() == 10)
      src.deleteTombstone(col("grp") === 1 && col("id") <= 20L)
      SecondaryIndex.refresh(spark, s"$dir/idx")
      val hits = SecondaryIndex.lookup(spark, s"$dir/idx", 1)
        .select("id").as[Long].collect().sorted.toSeq
      assert(hits == Seq(21L, 25L, 29L, 33L, 37L), s"got $hits")
    }
  }

  test("non-use_last tables and missing _change_type are rejected") {
    withTempPath { dir =>
      val t = GraftTable.create(spark, Seq((1L, 5)).toDF("id", "c"), dir,
        hashColumns = Seq("id"), bucketNum = 2,
        properties = Map(graft.meta.TableInfo.mergeOpProp("c") -> "sum_all"))
      val ch = Seq((1L, 9, "insert")).toDF("id", "c", "_change_type")
      val e = intercept[IllegalArgumentException](t.applyChanges(ch))
      assert(e.getMessage.contains("use_last"))
      val t2 = GraftTable.create(spark, Seq((1L, 5)).toDF("id", "c"),
        s"$dir/t2", hashColumns = Seq("id"), bucketNum = 2)
      val e2 = intercept[IllegalArgumentException](
        t2.applyChanges(Seq((1L, 9)).toDF("id", "c")))
      assert(e2.getMessage.contains("_change_type"))
    }
  }

  test("a feed with several events per key is rejected, not silently lost") {
    withTempPath { dir =>
      val t = GraftTable.create(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
        dir, hashColumns = Seq("id"), bucketNum = 2)
      // delete-then-reinsert of key 1 in ONE batch: the tombstone run
      // publishes newer than the upsert run, so accepting this would
      // resolve key 1 to deleted — must fail loudly instead
      val feed = Seq(
        (1L, null.asInstanceOf[String], "delete"),
        (1L, "reborn", "insert"),
        (2L, "b2", "update_postimage")
      ).toDF("id", "v", "_change_type")
      val e = intercept[IllegalArgumentException](t.applyChanges(feed))
      assert(e.getMessage.contains("multiple effective events"), e.getMessage)
      // table unchanged; preimage rows don't count toward the limit
      assert(t.toDF.count() == 2)
      val ok = Seq(
        (2L, "old", "update_preimage"),
        (2L, "newv", "update_postimage")
      ).toDF("id", "v", "_change_type")
      t.applyChanges(ok)
      assert(t.toDF.filter(col("id") === 2L).select("v").head.getString(0)
        == "newv")
    }
  }
}
