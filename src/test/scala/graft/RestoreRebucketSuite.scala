package graft

import graft.tables.{CompactionOptions, GraftTable}

/** RESTORE x re-bucket interplay (found by extending the ModelCheck op mix
  * with re-bucket, r14): repointing a table to old-mapping files while
  * info.bucketNum keeps the new count splits the same key across merge
  * groups — the next upsert duplicates it. The bucketNum must travel with
  * the restore, reconstructed from the mapping-change event log
  * (GraftTable.RebucketIntervalsProp), and a PER-PARTITION rollback across
  * a mapping change is refused (it cannot move the table-level count). */
class RestoreRebucketSuite extends SparkFixture {
  import spark.implicits._

  test("whole-table restore across a re-bucket restores the bucket count too") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        (1 to 32).map(i => (i.toLong, i)).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 2)
      Thread.sleep(3)
      val tsBefore = t.lastCommitTs
      t.compaction(CompactionOptions(newBucketNum = Some(4)), _ => true)
      Thread.sleep(3)
      val tsAfter = t.lastCommitTs
      assert(t.info.bucketNum == 4)

      // BACK across the re-bucket: count follows the restored files
      t.restoreToTimestamp(tsBefore)
      assert(t.info.bucketNum == 2, "restore must revert the bucket count")
      t.upsert(Seq((7L, 700)).toDF("id", "v"))
      assert(t.toDF.count() == 32, "same key must merge, not duplicate")
      assert(t.toDF.filter($"id" === 7L).select("v")
        .collect().map(_.getInt(0)).toSeq == Seq(700))
      assert(t.validate() == Nil)

      // FORWARD again (undo the restore): count follows forward too.
      // The upsert + restore above are themselves mapping-relevant
      // history; the event log replays through all of it.
      t.restoreToTimestamp(tsAfter)
      assert(t.info.bucketNum == 4, "re-restore must re-apply the count")
      t.upsert(Seq((7L, 777)).toDF("id", "v"))
      assert(t.toDF.count() == 32)
      assert(t.toDF.filter($"id" === 7L).select("v")
        .collect().map(_.getInt(0)).toSeq == Seq(777))
      assert(t.validate() == Nil)
    }
  }

  test("per-partition rollback across a re-bucket is refused loudly") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        (1 to 20).map(i => (i.toLong, s"p${i % 2}", i)).toDF("id", "part", "v"),
        path, rangeColumns = Seq("part"), hashColumns = Seq("id"), bucketNum = 2)
      Thread.sleep(3)
      t.compaction(CompactionOptions(newBucketNum = Some(4)), _ => true)
      // version 0 of the partition predates the re-bucket
      val e = intercept[IllegalArgumentException](
        t.rollbackPartition("part=p0", 0))
      assert(e.getMessage.contains("re-bucket boundary"), e.getMessage)
      // rolling back to a post-re-bucket version still works
      val head = t.partitions.find(_.partitionDesc == "part=p0").get.version
      t.rollbackPartition("part=p0", head) // no-op-ish, must not throw
      assert(t.toDF.count() == 20)
    }
  }

  test("an UNFINISHED file-store restore (crash between head repointing " +
    "and the count flip) blocks writers loudly and recovers by re-running") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        (1 to 16).map(i => (i.toLong, i)).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 2)
      Thread.sleep(3)
      val tsBefore = t.lastCommitTs
      t.compaction(CompactionOptions(newBucketNum = Some(4)), _ => true)
      Thread.sleep(3)
      // simulate the crash state the two-file protocol brackets: heads
      // conceptually mid-restore, RESTORE-PENDING marker set (carrying the
      // crashed attempt's wall-clock anchor), flip missing
      val crashAnchor = System.currentTimeMillis() - 60000 // "crashed a minute ago"
      graft.meta.MetaStore.default.updateProperties(path)(_ +
        (graft.meta.MetaStore.RestorePendingProp -> s"$tsBefore:$crashAnchor"))
      val e = intercept[IllegalStateException] {
        t.upsert(Seq((3L, 333)).toDF("id", "v"))
      }
      assert(e.getMessage.contains("restore") &&
        e.getMessage.contains("incomplete"), e.getMessage)
      // readers stay conservative (mapping-ambiguous), never wrong
      assert(t.toDF.count() == 16)
      assert(t.incremental(0L, t.lastCommitTs).count() >= 0) // cross path
      // recovery: re-run the restore — it completes the pair, clears the
      // marker, reverts the count, and writes flow again
      t.restoreToTimestamp(tsBefore)
      assert(!t.info.properties.contains(
        graft.meta.MetaStore.RestorePendingProp))
      assert(t.info.bucketNum == 2)
      // the recovery's mapping-change event must START at the crashed
      // attempt's anchor: the heads carried the restored mapping from the
      // crash on, and an event stamped only at recovery time would leave
      // that gap unrecorded once the marker cleared (a diff window over it
      // would pair buckets across two mappings)
      val events = t.info.properties(GraftTable.RebucketIntervalsProp)
      assert(events.split(",").exists(_.startsWith(s"$crashAnchor:")),
        s"recovered event must span from the crash anchor: $events")
      t.upsert(Seq((3L, 333)).toDF("id", "v"))
      assert(t.toDF.filter($"id" === 3L).select("v")
        .collect().map(_.getInt(0)).toSeq == Seq(333))
      assert(t.validate() == Nil)
    }
  }
}
