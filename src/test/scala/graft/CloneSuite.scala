package graft

import org.apache.spark.sql.functions._

import graft.tables.GraftTable

class CloneSuite extends SparkFixture {
  import spark.implicits._

  private def rows(n: Int, offset: Int = 0) =
    (offset until offset + n).map(i => (i.toLong, s"v$i", i * 2.0))
      .toDF("id", "s", "v")

  test("shallow clone preserves merged state and MOR run order") {
    withTempPath { dir =>
      val t = GraftTable.create(spark, rows(40), s"$dir/src",
        hashColumns = Seq("id"), bucketNum = 2)
      t.upsert(rows(20).withColumn("v", $"v" + 100))
      t.upsert(rows(10, offset = 40))
      val c = t.cloneTo(s"$dir/clone")
      assertSameRows(c.toDF, t.toDF)
      // zero data copied: every referenced file lives under the source
      assert(c.liveFiles.nonEmpty)
      assert(c.liveFiles.forall(_.file.path.contains("/src/")))
      // isolation: post-clone source writes don't leak into the clone
      t.upsert(rows(5).withColumn("v", lit(-1.0)))
      assert(c.toDF.filter($"v" === -1.0).count() == 0)
      assertSameRows(c.toDF.filter($"id" < 20).select($"v"),
        rows(20).select(($"v" + 100).as("v")))
    }
  }

  test("asOfTime clones the time-travel state") {
    withTempPath { dir =>
      val t = GraftTable.create(spark, rows(20), s"$dir/src",
        hashColumns = Seq("id"), bucketNum = 2)
      val ts = t.lastCommitTs
      t.upsert(rows(20).withColumn("v", $"v" * 10))
      val c = t.cloneTo(s"$dir/clone", asOfTime = Some(ts))
      assertSameRows(c.toDF, rows(20))
    }
  }

  test("clone vacuum never touches source files; compaction materializes") {
    withTempPath { dir =>
      val t = GraftTable.create(spark, rows(30), s"$dir/src",
        hashColumns = Seq("id"), bucketNum = 2)
      t.upsert(rows(15).withColumn("v", $"v" + 1))
      val c = t.cloneTo(s"$dir/clone")
      val expected = t.toDF.collect().toSet
      // vacuum on the clone sweeps only the clone's own (empty) data dir
      c.vacuum(0L)
      assert(t.toDF.collect().toSet == expected, "source files survived")
      assert(c.toDF.collect().toSet == expected)
      // compaction rewrites the referenced state into the clone's own
      // files -> self-contained deep copy; source files now unreferenced
      c.compaction()
      assert(c.liveFiles.forall(_.file.path.contains("/clone/")))
      assert(c.toDF.collect().toSet == expected)
    }
  }

  test("source vacuum keeps clone-referenced files; dropping the clone releases them") {
    withTempPath { dir =>
      val t = GraftTable.create(spark, rows(30), s"$dir/src",
        hashColumns = Seq("id"), bucketNum = 2)
      t.upsert(rows(15).withColumn("v", $"v" + 1))
      val c = t.cloneTo(s"$dir/clone")
      assert(t.clones == Seq(c.tablePath), "clone must register on the source")
      val expected = c.toDF.collect().toSet
      // source compaction orphans the pre-compaction files from the
      // SOURCE's perspective — but the clone still references them
      t.compaction()
      val swept = t.vacuum(0L)
      assert(swept == 0L,
        s"source vacuum must keep clone-referenced files, deleted $swept")
      assert(c.toDF.collect().toSet == expected, "clone broke after source vacuum")
      assert(c.validate() == Nil)
      // dropping the clone releases the references: the next source vacuum
      // sweeps the now-unreferenced pre-compaction files
      c.dropTable()
      val swept2 = t.vacuum(0L)
      assert(swept2 > 0L, "dropped clone must release its file references")
      assert(t.clones.isEmpty, "dropped clones must be pruned from the registry")
      assert(t.validate() == Nil)
    }
  }

  test("clone rejects existing targets and CDC sources") {
    withTempPath { dir =>
      val t = GraftTable.create(spark, rows(5), s"$dir/src",
        hashColumns = Seq("id"), bucketNum = 2)
      t.cloneTo(s"$dir/clone")
      intercept[IllegalArgumentException] { t.cloneTo(s"$dir/clone") }
    }
  }
}
