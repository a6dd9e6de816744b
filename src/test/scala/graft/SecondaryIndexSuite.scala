package graft

import org.apache.spark.sql.functions._

import graft.tables.{GraftTable, SecondaryIndex}

class SecondaryIndexSuite extends SparkFixture {
  import spark.implicits._

  private def rows(n: Int, offset: Int = 0) =
    (offset until offset + n).map(i =>
      (i.toLong, s"g${i % 5}", i * 1.5)).toDF("id", "g", "v")

  test("lookup returns exactly the matching rows, bucket-pruned") {
    withTempPath { dir =>
      val t = GraftTable.create(spark, rows(40), s"$dir/src",
        hashColumns = Seq("id"), bucketNum = 8)
      SecondaryIndex.create(spark, s"$dir/src", s"$dir/idx", "g", bucketNum = 8)
      SecondaryIndex.refresh(spark, s"$dir/idx")
      t.upsert(rows(40, offset = 40))
      SecondaryIndex.refresh(spark, s"$dir/idx")
      val got = SecondaryIndex.lookup(spark, s"$dir/idx", "g3")
      assertSameRows(got, rows(80).filter($"g" === "g3"))
      // unseen value -> empty frame, source schema
      val none = SecondaryIndex.lookup(spark, s"$dir/idx", "nope")
      assert(none.isEmpty && none.columns.toSeq == Seq("id", "g", "v"))
    }
  }

  test("hot-key lookup past the pushdown cap uses a semi-join, not a driver IN-list") {
    withTempPath { dir =>
      val n = SecondaryIndex.MaxPushdownPks + 2000
      // one hot value ("hot") on 12k rows, a cold one on 50
      val df = (0 until n).map(i => (i.toLong, "hot", i * 1.0))
        .toDF("id", "g", "v")
        .union((n until n + 50).map(i => (i.toLong, "cold", i * 1.0))
          .toDF("id", "g", "v"))
      GraftTable.create(spark, df, s"$dir/src",
        hashColumns = Seq("id"), bucketNum = 8)
      SecondaryIndex.create(spark, s"$dir/src", s"$dir/idx", "g", bucketNum = 8)
      SecondaryIndex.refresh(spark, s"$dir/idx")
      val hot = SecondaryIndex.lookup(spark, s"$dir/idx", "hot")
      // no giant IN-list in the plan: the hot path must be a semi-join
      val plan = hot.queryExecution.optimizedPlan.toString
      assert(plan.contains("LeftSemi"),
        s"hot-key lookup must plan a semi-join, got:\n${plan.take(800)}")
      assert(!plan.contains(" IN ("), "no driver IN-list on the hot path")
      assert(hot.count() == n)
      assert(hot.agg(min("id"), max("id")).head.toSeq == Seq(0L, (n - 1).toLong))
      // cold key stays on the bucket-pruned pushdown path and is identical
      val cold2 = SecondaryIndex.lookup(spark, s"$dir/idx", "cold")
      assert(!cold2.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
      assert(cold2.count() == 50)
    }
  }

  test("postings fold through index compaction; stale postings filtered") {
    withTempPath { dir =>
      val t = GraftTable.create(spark, rows(30), s"$dir/src",
        hashColumns = Seq("id"), bucketNum = 4)
      SecondaryIndex.create(spark, s"$dir/src", s"$dir/idx", "g")
      SecondaryIndex.refresh(spark, s"$dir/idx")
      t.upsert(rows(30, offset = 30))
      SecondaryIndex.refresh(spark, s"$dir/idx")
      val idx = GraftTable.forPath(spark, s"$dir/idx")
      idx.compaction()
      assertSameRows(SecondaryIndex.lookup(spark, s"$dir/idx", "g1"),
        rows(60).filter($"g" === "g1"))
      // posting lists are sorted distinct after the fold
      val pks = idx.toDF.filter($"ival" === "g1")
        .select($"pks").head.getSeq[Long](0)
      assert(pks == pks.distinct.sorted && pks.size == 12)
      // upsert MOVES id=1 (g1 -> g4): the g1 posting is now stale; the
      // lookup re-verify drops the fetched row, so answers stay correct
      t.upsert(Seq((1L, "g4", -1.0)).toDF("id", "g", "v"))
      assertSameRows(SecondaryIndex.lookup(spark, s"$dir/idx", "g1"),
        rows(60).filter($"g" === "g1" && $"id" =!= 1L))
    }
  }

  test("maintainStream folds micro-batches; binds the checkpoint") {
    withTempPath { dir =>
      val t = GraftTable.create(spark, rows(30), s"$dir/src",
        hashColumns = Seq("id"), bucketNum = 4)
      t.upsert(rows(30, offset = 30))
      SecondaryIndex.create(spark, s"$dir/src", s"$dir/idx", "g")
      val q1 = SecondaryIndex.maintainStream(spark, s"$dir/idx", s"$dir/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q1.awaitTermination(120000)
      t.upsert(rows(20, offset = 60))
      val q2 = SecondaryIndex.maintainStream(spark, s"$dir/idx", s"$dir/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q2.awaitTermination(120000)
      assertSameRows(SecondaryIndex.lookup(spark, s"$dir/idx", "g2"),
        rows(80).filter($"g" === "g2"))
      intercept[IllegalArgumentException] {
        SecondaryIndex.refresh(spark, s"$dir/idx")
      }
      intercept[IllegalStateException] {
        SecondaryIndex.maintainStream(spark, s"$dir/idx", s"$dir/other")
      }
    }
  }

  test("refresh rejects non-incremental sources; create validates") {
    withTempPath { dir =>
      val t = GraftTable.create(spark, rows(10), s"$dir/src",
        hashColumns = Seq("id"), bucketNum = 2)
      intercept[IllegalArgumentException] {
        SecondaryIndex.create(spark, s"$dir/src", s"$dir/idx0", "id")
      }
      SecondaryIndex.create(spark, s"$dir/src", s"$dir/idx", "g")
      SecondaryIndex.refresh(spark, s"$dir/idx")
      // a window carrying DELETE + UPDATE no longer wedges maintenance:
      // refresh folds the ADD side of the change feed; deleted pks fetch
      // nothing and moved values fail re-verification, so lookups stay
      // exact through the mutation
      t.delete($"id" === 3L)                        // g3 loses id 3
      t.update($"id" === 7L, Map("g" -> lit("g3"))) // id 7 moves g2 -> g3
      t.upsert(rows(5, offset = 10))                // ids 10-14 insert
      SecondaryIndex.refresh(spark, s"$dir/idx")
      assertSameRows(SecondaryIndex.lookup(spark, s"$dir/idx", "g3"),
        t.toDF.filter($"g" === "g3"))
      assert(SecondaryIndex.lookup(spark, s"$dir/idx", "g3")
        .select("id").as[Long].collect().toSet == Set(7L, 8L, 13L))
      // the moved row's OLD value no longer returns it
      assert(!SecondaryIndex.lookup(spark, s"$dir/idx", "g2")
        .select("id").as[Long].collect().contains(7L))
    }
  }
}
