package graft

import org.apache.spark.sql.functions._

import graft.meta.{FileMetaStore, JdbcMetaStore, MetaStore}
import graft.tables.GraftTable

/** Whole-table RESTORE — the atomic table-wide companion of
  * rollbackPartition (Delta RESTORE TABLE / Iceberg rollback_to_timestamp).
  * Covers: snapshot equivalence, drop of partitions created after the
  * boundary, idempotence, undo-by-restore, file/JDBC store parity, and the
  * CALL surface. */
class RestoreSuite extends SparkFixture {
  import spark.implicits._

  private def src = (1 to 40).map(i => (i.toLong, i * 10, s"g${i % 4}"))
    .toDF("id", "v", "g")

  test("restore returns the table to the snapshot at the boundary") {
    withTempPath { path =>
      val t = GraftTable.create(spark, src, path,
        hashColumns = Seq("id"), bucketNum = 2)
      val ts1 = t.lastCommitTs
      t.upsert(src.withColumn("v", col("v") * 7))
      t.delete("id % 3 = 0")
      assert(t.toDF.count() < 40)
      val moved = t.restoreToTimestamp(ts1)
      assert(moved.nonEmpty)
      // row-identical to the pre-mutation snapshot AND to snapshotAt(ts1)
      assertSameRows(t.toDF, src)
      assertSameRows(t.toDF, t.snapshotAt(ts1))
      // idempotent: a second restore to the same boundary appends nothing
      assert(t.restoreToTimestamp(ts1).isEmpty)
    }
  }

  test("partitions created after the boundary are dropped atomically") {
    withTempPath { path =>
      val a = src.filter(col("g") === "g0")
      val t = GraftTable.create(spark, a, path,
        rangeColumns = Seq("g"), hashColumns = Seq("id"), bucketNum = 2)
      val ts1 = t.lastCommitTs
      t.upsert(src.filter(col("g") === "g1")) // NEW range partition g=g1
      t.upsert(a.withColumn("v", col("v") + 1))
      assert(t.partitions.map(_.partitionDesc).toSet == Set("g=g0", "g=g1"))
      t.restoreToTimestamp(ts1)
      // g=g1 did not exist at the boundary: restore drops it; g=g0 rolls back
      assert(t.partitions.map(_.partitionDesc).toSet == Set("g=g0"))
      assertSameRows(t.toDF, a)
    }
  }

  test("a restore is itself a commit: undoable by restoring past it") {
    withTempPath { path =>
      val t = GraftTable.create(spark, src, path,
        hashColumns = Seq("id"), bucketNum = 2)
      val ts1 = t.lastCommitTs
      t.upsert(src.withColumn("v", col("v") * 2))
      val ts2 = t.lastCommitTs
      t.restoreToTimestamp(ts1)
      assertSameRows(t.toDF, src)
      // undo the restore: go back to the post-upsert state
      t.restoreToTimestamp(ts2)
      assertSameRows(t.toDF, src.withColumn("v", col("v") * 2))
    }
  }

  test("restoreToVersion uses history's 1-based commit numbering") {
    withTempPath { path =>
      val t = GraftTable.create(spark, src, path,
        hashColumns = Seq("id"), bucketNum = 2)
      t.upsert(src.withColumn("v", col("v") * 5))
      t.delete("id > 20")
      assert(t.history.size >= 3)
      t.restoreToVersion(2)
      assertSameRows(t.toDF, src.withColumn("v", col("v") * 5))
      t.restoreToVersion(1)
      assertSameRows(t.toDF, src)
    }
  }

  test("history and VERSION AS OF stay aligned across dropPartition and restore (r12 ADVICE)") {
    withTempPath { path =>
      import org.apache.spark.sql.functions.lit
      val t = GraftTable.create(spark,
        Seq((1L, "p1", 10), (2L, "p2", 20)).toDF("id", "part", "v"), path,
        rangeColumns = Seq("part"), hashColumns = Seq("id"), bucketNum = 1)
      Thread.sleep(3)
      // a commit touching ONLY the partition that will be dropped — the
      // boundary the lineage-cut numbering used to lose
      t.upsert(Seq((2L, "p2", 21)).toDF("id", "part", "v"))
      Thread.sleep(3)
      t.dropPartition("part=p2")
      Thread.sleep(3)
      t.upsert(Seq((1L, "p1", 11)).toDF("id", "part", "v"))
      val hist = t.history
      // every raw commit boundary is a history row: create, p2-only
      // upsert, DROP (visible, op labeled), p1 upsert
      assert(hist.size == 4, hist)
      assert(hist(2)._3.contains("drop"), s"drop commit must appear: $hist")
      // the VERSION AS OF resolver numbers the SAME boundaries
      assert(hist.indices.forall(i => t.timestampOfVersion(i + 1) == hist(i)._2),
        "timestampOfVersion and history must agree on every boundary")
      // v2 = after the p2-only upsert: restoring there RESURRECTS p2
      t.restoreToVersion(2)
      assertRows(t.toDF.select("id", "v"), Seq("[1,10]", "[2,21]"))
      // and the restore added boundaries; numbering keeps extending
      val hist2 = t.history
      assert(hist2.size > 4)
      assert(hist2.indices.forall(i => t.timestampOfVersion(i + 1) == hist2(i)._2))
    }
  }

  test("file and jdbc stores restore identically on the same op script") {
    withTempPath { pathA => withTempPath { pathB =>
      val jdbc = new JdbcMetaStore("jdbc:derby:memory:restoredb;create=true")
      val stores: Seq[(MetaStore, String)] =
        Seq((new FileMetaStore, pathA), (jdbc, pathB))
      val results = stores.map { case (store, path) =>
        val t = GraftTable.create(spark, src, path,
          hashColumns = Seq("id"), bucketNum = 2, store = store)
        val ts1 = t.lastCommitTs
        t.upsert(src.withColumn("v", col("v") * 7))
        t.delete("id % 4 = 0")
        val moved = t.restoreToTimestamp(ts1).sorted
        (moved, t.toDF.collect().map(_.toString).sorted.toSeq)
      }
      assert(results(0)._1 == results(1)._1, "moved partition sets differ")
      assert(results(0)._2 == results(1)._2, "restored rows differ")
      assert(results(0)._2 == src.collect().map(_.toString).sorted.toSeq)
      jdbc.dropTable(pathB)
    }}
  }

  test("restore past the retention horizon fails loudly, never empties data") {
    withTempPath { path =>
      val t = GraftTable.create(spark, src, path,
        hashColumns = Seq("id"), bucketNum = 2)
      val tsCreate = t.lastCommitTs
      Thread.sleep(5)
      t.upsert(src.withColumn("v", col("v") + 1))
      val tsV1 = t.lastCommitTs
      Thread.sleep(5)
      t.upsert(src.withColumn("v", col("v") + 2))
      // prune history: the creation line (version 0) is dropped, the newest
      // at-or-before tsV1 becomes each partition's retained base
      MetaStore.default.compactVersionLog(t.tablePath, tsV1)
      // a boundary the log can still answer works
      assert(t.restoreToTimestamp(tsV1).nonEmpty)
      assertSameRows(t.toDF, src.withColumn("v", col("v") + 1))
      // a boundary BEFORE the retained base must fail, not silently drop
      val e = intercept[IllegalStateException](t.restoreToTimestamp(tsCreate))
      assert(e.getMessage.contains("pruned by retention"))
      assertSameRows(t.toDF, src.withColumn("v", col("v") + 1)) // untouched
    }
  }

  test("restore x secondary index: stale postings re-verify; refresh stays exact") {
    withTempPath { dir =>
      val rows0 = (1 to 30).map(i => (i.toLong, s"g${i % 3}", i * 1.0))
        .toDF("id", "g", "v")
      val t = GraftTable.create(spark, rows0, s"$dir/src",
        hashColumns = Seq("id"), bucketNum = 4)
      graft.tables.SecondaryIndex.create(
        spark, s"$dir/src", s"$dir/idx", "g", bucketNum = 4)
      graft.tables.SecondaryIndex.refresh(spark, s"$dir/idx")
      val ts1 = t.lastCommitTs
      Thread.sleep(5)
      // new rows under a brand-new indexed value, then index them
      t.upsert((100 to 110).map(i => (i.toLong, "gX", i * 1.0))
        .toDF("id", "g", "v"))
      graft.tables.SecondaryIndex.refresh(spark, s"$dir/idx")
      assert(graft.tables.SecondaryIndex
        .lookup(spark, s"$dir/idx", "gX").count() == 11)
      // restore the SOURCE past those rows: postings for gX are now stale
      t.restoreToTimestamp(ts1)
      // lookups re-verify fetched rows — stale postings return nothing
      assert(graft.tables.SecondaryIndex
        .lookup(spark, s"$dir/idx", "gX").isEmpty)
      assertSameRows(
        graft.tables.SecondaryIndex.lookup(spark, s"$dir/idx", "g1"),
        rows0.filter($"g" === "g1"))
      // maintenance across the restore window keeps lookups exact
      Thread.sleep(5)
      t.upsert(Seq((200L, "gY", 1.0)).toDF("id", "g", "v"))
      graft.tables.SecondaryIndex.refresh(spark, s"$dir/idx")
      assert(graft.tables.SecondaryIndex
        .lookup(spark, s"$dir/idx", "gY").count() == 1)
      assert(graft.tables.SecondaryIndex
        .lookup(spark, s"$dir/idx", "gX").isEmpty)
    }
  }

  test("restore x shallow clone: clone stays pinned; source vacuum keeps its files") {
    withTempPath { dir =>
      val t = GraftTable.create(spark, src, s"$dir/src",
        hashColumns = Seq("id"), bucketNum = 2)
      val ts1 = t.lastCommitTs
      Thread.sleep(5)
      t.upsert(src.withColumn("v", col("v") * 5))
      val cl = t.cloneTo(s"$dir/clone") // pins the post-upsert snapshot
      val pinned = cl.toDF.collect().map(_.toString).sorted
      // restoring the SOURCE must not move the clone
      t.restoreToTimestamp(ts1)
      assertSameRows(t.toDF, src)
      assert(cl.toDF.collect().map(_.toString).sorted.sameElements(pinned),
        "clone content moved with the source restore")
      // source vacuum after the restore keeps clone-referenced files alive
      t.vacuum()
      assert(cl.toDF.collect().map(_.toString).sorted.sameElements(pinned),
        "vacuum after restore deleted files the clone still reads")
    }
  }

  test("a restored source makes mview refresh fail loudly, never fold wrong") {
    withTempPath { dir =>
      val srcPath = s"$dir/src"; val viewPath = s"$dir/view"
      val src = GraftTable.create(spark, src3col(srcPath), srcPath)
      graft.pipeline.MaterializedView.create(spark, srcPath, viewPath,
        keys = Seq("g"),
        measures = Seq(
          graft.pipeline.MaterializedView.Measure("total", "v", "sum")))
      graft.pipeline.MaterializedView.refresh(spark, viewPath)
      val ts1 = src.lastCommitTs
      src.append(src3col(srcPath))
      src.restoreToTimestamp(ts1)
      // the restore's Update commit sits in the refresh window: folding it
      // as a delta would double-count, so refresh must refuse
      val e = intercept[IllegalArgumentException] {
        graft.pipeline.MaterializedView.refresh(spark, viewPath)
      }
      assert(e.getMessage.contains("non-incremental"), e.getMessage)
    }
  }

  private def src3col(path: String) =
    (1 to 20).map(i => (i.toLong + path.hashCode.abs % 7, i * 10, s"g${i % 3}"))
      .toDF("id", "v", "g")

  test("CALL graft.restore by version and by timestamp") {
    withTempPath { path =>
      val t = GraftTable.create(spark, src, path,
        hashColumns = Seq("id"), bucketNum = 2)
      val ts1 = t.lastCommitTs
      t.upsert(src.withColumn("v", col("v") * 9))
      val out = spark.sql(
        s"CALL graft.restore(table_path => '$path', as_of_ts => '$ts1')")
        .collect().map(_.getString(0)).mkString
      assert(out.contains("restored"))
      assertSameRows(GraftTable.forPath(spark, path).toDF, src)
      spark.sql(s"CALL graft.restore(table_path => '$path', version => '2')")
      assertSameRows(GraftTable.forPath(spark, path).toDF,
        src.withColumn("v", col("v") * 9))
    }
  }

  test("strict incremental reads fail loudly when a partition was dropped " +
    "in — or cut by a tombstone after — the window") {
    withTempPath { path =>
      val t = GraftTable.create(spark, src, path,
        rangeColumns = Seq("g"), hashColumns = Seq("id"), bucketNum = 2)
      val ts0 = t.lastCommitTs
      Thread.sleep(5)
      t.upsert(src.withColumn("v", col("v") + 1)) // deltas in-window
      val ts1 = t.lastCommitTs
      Thread.sleep(5)
      t.dropPartition("g=g1")
      val dropTs = t.lastCommitTs

      // window covering the drop: strict throws and names the partition
      val e1 = intercept[graft.meta.NonIncrementalWindowException] {
        t.incremental(ts0, dropTs, strict = true).count()
      }
      assert(e1.partitionDesc == "g=g1" && e1.boundaryTs == dropTs)

      // IN-FLIGHT RACE (a restore/drop landing between a micro-batch's
      // offset resolution and its file planning): the window END precedes
      // the tombstone, but the tombstone has already cut g=g1's in-window
      // lineage — strict must throw, never serve a partial window
      intercept[graft.meta.NonIncrementalWindowException] {
        t.incremental(ts0, ts1, strict = true).count()
      }

      // a strict reader scoped AWAY from the dropped partition is unaffected
      assert(t.incremental(ts0, ts1, _ == "g=g0", strict = true).count() > 0)

      // non-strict keeps the batch abort-to-empty semantics: the dropped
      // partition contributes nothing, live partitions still deliver
      val inc = t.incremental(ts0, ts1)
      assert(inc.filter(col("g") === "g1").isEmpty)
      assert(inc.filter(col("g") =!= "g1").count() > 0)

      // a reader re-pinned past the boundary resumes clean delivery
      Thread.sleep(5)
      t.upsert(src.filter(col("g") === "g0").withColumn("v", col("v") + 2))
      assert(t.incremental(dropTs, Long.MaxValue, strict = true).count() > 0)
    }
  }

  test("restore tombstones of born-after partitions surface in " +
    "droppedBetween identically on file and jdbc stores") {
    withTempPath { pathA => withTempPath { pathB =>
      val jdbc = new JdbcMetaStore("jdbc:derby:memory:droppeddb;create=true")
      val stores: Seq[(MetaStore, String)] =
        Seq((new FileMetaStore, pathA), (jdbc, pathB))
      val results = stores.map { case (store, path) =>
        val a = src.filter(col("g") === "g0")
        val t = GraftTable.create(spark, a, path,
          rangeColumns = Seq("g"), hashColumns = Seq("id"), bucketNum = 2,
          store = store)
        val ts1 = t.lastCommitTs
        Thread.sleep(5)
        t.upsert(src.filter(col("g") === "g1")) // born after the boundary
        Thread.sleep(5)
        t.restoreToTimestamp(ts1) // tombstones g=g1
        val restoreTs = t.lastCommitTs
        val dropped = store.droppedBetween(path, ts1, Long.MaxValue)
        assert(dropped.map(_._1) == Seq("g=g1"), s"dropped=$dropped")
        assert(dropped.head._2 == restoreTs)
        // nothing tombstoned before the upsert window opened
        assert(store.droppedBetween(path, restoreTs, Long.MaxValue).isEmpty)
        val e = intercept[graft.meta.NonIncrementalWindowException] {
          t.incremental(ts1, restoreTs, strict = true).count()
        }
        (dropped.map(_._1), e.partitionDesc)
      }
      assert(results(0) == results(1), "file/jdbc droppedBetween parity")
      jdbc.dropTable(pathB)
    }}
  }

  test("dropPartition aborts a running incremental stream LOUDLY instead " +
    "of silently skipping the dropped partition's window") {
    withTempPath { path =>
      withTempPath { out =>
        withTempPath { ckpt =>
          import org.apache.spark.sql.streaming.Trigger
          val t = GraftTable.create(spark,
            Seq((1L, "g0", "a"), (2L, "g1", "b")).toDF("id", "g", "v"), path,
            rangeColumns = Seq("g"), hashColumns = Seq("id"), bucketNum = 1)
          def run() = {
            val q = spark.readStream.format("graft").load(path)
              .writeStream.format("graft")
              .option("path", s"$out/d")
              .option("hashPartitions", "id").option("hashBucketNum", "1")
              .option("checkpointLocation", s"$ckpt/q")
              .trigger(Trigger.AvailableNow()).start()
            q.awaitTermination(120000)
            q
          }
          run()
          assert(spark.read.format("graft").load(s"$out/d").count() == 2)
          // rows land in g=g1 then the partition is dropped: the stream's
          // next window can neither deliver nor retract them
          t.upsert(Seq((3L, "g1", "c")).toDF("id", "g", "v"))
          t.dropPartition("g=g1")
          val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
            run()
          }
          val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
          assert(msg.contains("non-delta commit") && msg.contains("readStartTime"),
            s"expected the strict-window error, got: $msg")
        }
      }
    }
  }

  test("restore aborts a running incremental stream LOUDLY with re-pin " +
    "guidance; readStartTime past the boundary resumes delivery") {
    withTempPath { path =>
      withTempPath { out =>
        withTempPath { ckpt =>
          import org.apache.spark.sql.streaming.Trigger
          val t = GraftTable.create(spark, Seq((1L, "a")).toDF("id", "v"), path,
            hashColumns = Seq("id"), bucketNum = 1)
          t.upsert(Seq((2L, "b")).toDF("id", "v"))
          def run(dst: String, dir: String,
              opts: Map[String, String] = Map.empty) = {
            var r = spark.readStream.format("graft")
            opts.foreach { case (k, v) => r = r.option(k, v) }
            val q = r.load(path)
              .writeStream.format("graft")
              .option("path", dst)
              .option("hashPartitions", "id").option("hashBucketNum", "1")
              .option("checkpointLocation", dir)
              .trigger(Trigger.AvailableNow()).start()
            q.awaitTermination(120000)
            q
          }
          run(s"$out/d1", s"$ckpt/q")
          assert(spark.read.format("graft").load(s"$out/d1").count() == 2)

          val ts1 = t.lastCommitTs
          t.upsert(Seq((3L, "c")).toDF("id", "v")) // the stream never sees this
          t.restoreToTimestamp(ts1)
          val restoreTs = t.lastCommitTs

          // checkpointed offset now precedes the RESTORE boundary: the next
          // micro-batch must FAIL with guidance, not silently skip the
          // window and advance the offset past it
          val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
            run(s"$out/d1", s"$ckpt/q")
          }
          val msg = Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage
          assert(msg.contains("non-delta commit") && msg.contains("readStartTime"),
            s"expected the strict-window error with re-pin guidance, got: $msg")

          // the advertised re-pin: a fresh checkpoint pinned past the
          // restore boundary resumes clean delta delivery
          run(s"$out/d2", s"$ckpt/q2",
            Map("readStartTime" -> restoreTs.toString))
          t.upsert(Seq((4L, "d")).toDF("id", "v"))
          run(s"$out/d2", s"$ckpt/q2",
            Map("readStartTime" -> restoreTs.toString))
          assertRows(spark.read.format("graft").load(s"$out/d2"), Seq("[4,d]"))
        }
      }
    }
  }
}
