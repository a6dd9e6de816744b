package graft

/* CDC change-feed correctness around compactions and re-buckets — the
 * focused pins behind CdcModelCheckSuite's randomized findings (r14):
 * fold(diff(0, head)) must reproduce head visibility across full/leveled
 * compaction and re-bucket; incremental windows spanning a re-bucket must
 * merge straddling keys per partition (readCrossBucket), and time travel
 * across a down-bucket must keep every row. */

import graft.meta.TableInfo
import graft.tables.{CompactionOptions, GraftTable}

class CdcFeedFoldSuite extends SparkFixture {
  import spark.implicits._
  private def fold(t: GraftTable): Map[Long, String] =
    t.diff(0L, t.lastCommitTs).select("id", "data", "_change_type")
      .as[(Long, String, String)].collect()
      .foldLeft(Map.empty[Long, String]) { case (acc, (k, v, ct)) =>
        if (ct == "delete") acc - k else acc + (k -> v) }

  private def mk(path: String) = GraftTable.create(spark,
    Seq((1L, "a", "insert"), (2L, "b", "insert")).toDF("id", "data", "op"),
    path, hashColumns = Seq("id"), bucketNum = 2,
    properties = Map(TableInfo.CdcColumnProp -> "op"))

  test("s1 delete then FULL compaction") {
    withTempPath { p => val t = mk(p)
      t.upsert(Seq((1L, "a", "delete")).toDF("id", "data", "op"))
      t.compaction()
      t.upsert(Seq((3L, "c", "insert")).toDF("id", "data", "op"))
      println(s"[s1] fold=${fold(t)} visible=${t.toDF.count()}")
      assert(fold(t) == Map(2L -> "b", 3L -> "c"), fold(t)) }
  }
  test("s2 delete then LEVELED compaction") {
    withTempPath { p => val t = mk(p)
      t.upsert(Seq((1L, "a", "delete")).toDF("id", "data", "op"))
      t.compaction(CompactionOptions(fileSizeLimit = Some(256L * 1024)), _ => true)
      t.upsert(Seq((3L, "c", "insert")).toDF("id", "data", "op"))
      println(s"[s2] fold=${fold(t)}")
      assert(fold(t) == Map(2L -> "b", 3L -> "c"), fold(t)) }
  }
  test("s3 delete then RE-BUCKET") {
    withTempPath { p => val t = mk(p)
      t.upsert(Seq((1L, "a", "delete")).toDF("id", "data", "op"))
      t.compaction(CompactionOptions(newBucketNum = Some(3)), _ => true)
      t.upsert(Seq((3L, "c", "insert")).toDF("id", "data", "op"))
      println(s"[s3] fold=${fold(t)}")
      assert(fold(t) == Map(2L -> "b", 3L -> "c"), fold(t)) }
  }
  test("s4 update then RE-BUCKET") {
    withTempPath { p => val t = mk(p)
      t.upsert(Seq((1L, "a2", "update")).toDF("id", "data", "op"))
      t.compaction(CompactionOptions(newBucketNum = Some(3)), _ => true)
      println(s"[s4] fold=${fold(t)}")
      assert(fold(t) == Map(1L -> "a2", 2L -> "b"), fold(t)) }
  }
}

class CdcFeedStraddleSuite extends SparkFixture {
  import spark.implicits._
  private def fold(t: GraftTable): Map[Long, String] =
    t.diff(0L, t.lastCommitTs).select("id", "data", "_change_type")
      .as[(Long, String, String)].collect()
      .foldLeft(Map.empty[Long, String]) { case (acc, (k, v, ct)) =>
        if (ct == "delete") acc - k else acc + (k -> v) }
  private def mk(path: String) = GraftTable.create(spark,
    Seq((1L, "a", "insert"), (2L, "b", "insert")).toDF("id", "data", "op"),
    path, hashColumns = Seq("id"), bucketNum = 2,
    properties = Map(graft.meta.TableInfo.CdcColumnProp -> "op"))

  test("s5 same-key updates straddling a compaction") {
    withTempPath { p => val t = mk(p)
      t.upsert(Seq((1L, "a2", "update")).toDF("id", "data", "op"))
      t.compaction()
      t.upsert(Seq((1L, "a3", "update")).toDF("id", "data", "op"))
      println(s"[s5] fold=${fold(t)}")
      assert(fold(t) == Map(1L -> "a3", 2L -> "b"), fold(t)) }
  }
  test("s6 two compactions, updates between") {
    withTempPath { p => val t = mk(p)
      t.upsert(Seq((1L, "a2", "update")).toDF("id", "data", "op"))
      t.compaction()
      t.upsert(Seq((1L, "a3", "update")).toDF("id", "data", "op"))
      t.compaction()
      t.upsert(Seq((1L, "a4", "update")).toDF("id", "data", "op"))
      println(s"[s6] fold=${fold(t)}")
      assert(fold(t) == Map(1L -> "a4", 2L -> "b"), fold(t)) }
  }
  test("s7 delete + revive straddling compactions") {
    withTempPath { p => val t = mk(p)
      t.upsert(Seq((1L, "a", "delete")).toDF("id", "data", "op"))
      t.compaction()
      t.upsert(Seq((1L, "z", "insert")).toDF("id", "data", "op"))
      t.compaction(graft.tables.CompactionOptions(newBucketNum = Some(3)), _ => true)
      t.upsert(Seq((2L, "b", "delete")).toDF("id", "data", "op"))
      println(s"[s7] fold=${fold(t)}")
      assert(fold(t) == Map(1L -> "z"), fold(t)) }
  }
}

class SnapshotRebucketSuite extends SparkFixture {
  import spark.implicits._
  test("time travel across a DOWN-bucket keeps every row") {
    withTempPath { p =>
      val t = GraftTable.create(spark,
        (1 to 40).map(i => (i.toLong, i)).toDF("id", "v"), p,
        hashColumns = Seq("id"), bucketNum = 3)
      Thread.sleep(3)
      val ts = t.lastCommitTs
      t.compaction(graft.tables.CompactionOptions(newBucketNum = Some(2)), _ => true)
      println(s"[snap] head=${t.toDF.count()} atOld=${t.snapshotAt(ts).count()}")
      assert(t.toDF.count() == 40)
      assert(t.snapshotAt(ts).count() == 40, "old snapshot lost rows")
    }
  }
}

class IncrementalRebucketSuite extends SparkFixture {
  import spark.implicits._
  test("incremental window across a re-bucket merges per key") {
    withTempPath { p =>
      val t = GraftTable.create(spark,
        (1 to 10).map(i => (i.toLong, s"a$i", "insert")).toDF("id", "data", "op"), p,
        hashColumns = Seq("id"), bucketNum = 3,
        properties = Map(graft.meta.TableInfo.CdcColumnProp -> "op"))
      t.upsert((1 to 10).map(i => (i.toLong, s"b$i", "update")).toDF("id", "data", "op"))
      t.compaction(graft.tables.CompactionOptions(newBucketNum = Some(2)), _ => true)
      t.upsert((1 to 10).map(i => (i.toLong, s"c$i", "update")).toDF("id", "data", "op"))
      val rows = t.incremental(0L, t.lastCommitTs)
        .select("id", "data").as[(Long, String)].collect().toSeq.sorted
      println(s"[inc] n=${rows.size} sample=${rows.take(6)}")
      assert(rows.size == 10, s"per-key LWW broken: ${rows.size} rows")
      assert(rows.forall(_._2.startsWith("c")), rows.filterNot(_._2.startsWith("c")).take(5).toString)
    }
  }
}
