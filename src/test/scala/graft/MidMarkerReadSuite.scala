package graft

import graft.meta.MetaStore
import graft.tables.{CompactionOptions, GraftTable}

/** r16 find — reads and compactions over a MAPPING-MIXED state: an open
  * re-bucket marker (live rewrite or crashed attempt) with post-flip
  * writes leaves the snapshot holding files bucketed under TWO
  * key->bucket mappings. Per-bucket dispatch double-surfaced straddling
  * keys on every read path, and a full compaction over that state BAKED
  * the duplicates in permanently (its write skips dedup by contract) —
  * reachable by a normal re-bucket retrying after a heads-CAS conflict
  * with a concurrent upsert, not just by crashes. The fix cuts every
  * merged read at the recorded flip boundaries (RebucketLog.epochsOf):
  * cleanly mixed sets take the cursor-split read, ambiguous ones the
  * cross-bucket merge. */
class MidMarkerReadSuite extends SparkFixture {
  import spark.implicits._

  /** Forge the crashed-re-bucket state exactly as compactionRun leaves it
    * after the flip: count flipped + open marker (store-clock boundary),
    * no rewrite. */
  private def forgeOpenMarker(path: String, newN: Int): Unit =
    MetaStore.default.updateInfoAtFlip(path)((cur, ts0) =>
      cur.copy(bucketNum = newN,
        properties = graft.meta.RebucketLog.appendOpen(
          cur.properties, ts0, cur.bucketNum, newN)))

  test("full read mid-open-marker with a new-count delta: no duplicate keys") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        (1 to 32).map(i => (i.toLong, i)).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 2)
      forgeOpenMarker(path, 8)
      // a write planned under the NEW count lands (bucket CAS passes)
      t.upsert((1 to 16).map(i => (i.toLong, i * 100)).toDF("id", "v"))
      val rows = t.toDF.collect().map(r => (r.getLong(0), r.getInt(1))).sorted
      assert(rows.length == 32, s"expected 32 rows, got ${rows.length}:\n" +
        rows.mkString("\n"))
      assert(rows.take(16).map(_._2).toSeq == (1 to 16).map(_ * 100),
        "delta must win")
      // library path too
      assert(t.toDF(_ => true).count() == 32)
      // time travel INTO the mixed state after more history lands
      val tsMixed = t.lastCommitTs
      t.upsert(Seq((40L, 40)).toDF("id", "v"))
      assert(t.snapshotAt(tsMixed).count() == 32)
    }
  }

  test("plain full compaction in the crashed-marker state does not bake duplicates") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        (1 to 32).map(i => (i.toLong, i)).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 2)
      forgeOpenMarker(path, 8)
      t.upsert((1 to 16).map(i => (i.toLong, i * 100)).toDF("id", "v"))
      // the retried re-bucket takes exactly this path: plain full
      // compaction over the mixed-mapping state
      t.compaction()
      val rows = t.toDF.collect().map(r => (r.getLong(0), r.getInt(1))).sorted
      assert(rows.length == 32,
        s"compaction baked duplicates: ${rows.length} rows:\n${rows.mkString("\n")}")
      assert(rows.take(16).map(_._2).toSeq == (1 to 16).map(_ * 100))
      // and a full whole-table compaction is the roll-forward: it closed
      // the orphaned marker, so id-derived optimizations come back
      assert(!graft.meta.RebucketLog.hasOpen(t.info.properties),
        "full whole-table compaction must close the orphaned open marker")
      assert(t.validate() == Nil)
    }
  }

  test("SQL (DSv2) full read mid-open-marker: no duplicate keys") {
    withTempPath { wh =>
      spark.conf.set("spark.sql.catalog.graft_cat", "graft.catalog.GraftCatalogV2")
      spark.conf.set("spark.graft.warehouse", wh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.mm")
      (1 to 32).map(i => (i.toLong, i)).toDF("id", "v")
        .createOrReplaceTempView("mm_src")
      spark.sql("CREATE TABLE graft_cat.mm.t PARTITIONED BY (bucket(2, id)) " +
        "AS SELECT * FROM mm_src")
      val t = GraftTable.forName(spark, "mm.t")
      forgeOpenMarker(t.path, 8)
      t.upsert((1 to 16).map(i => (i.toLong, i * 100)).toDF("id", "v"))
      val out = spark.sql("SELECT * FROM graft_cat.mm.t")
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted
      assert(out.length == 32, s"DSv2 scan duplicated keys: ${out.length}")
      assert(out.take(16).map(_._2).toSeq == (1 to 16).map(_ * 100))
      // point lookup stays correct (prune is off, scan still finds the key)
      assert(spark.sql("SELECT v FROM graft_cat.mm.t WHERE id = 3")
        .collect().map(_.getInt(0)).toSeq == Seq(300))
    }
  }

  test("mixed-state reads: cursor-split and cross-bucket paths agree") {
    // NO cushion shrink: the flip boundary is store-clock exact, so even
    // millisecond histories classify cleanly around it
    withTempPath { path =>
      val t = GraftTable.create(spark,
        (1 to 48).map(i => (i.toLong, i)).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 2)
      forgeOpenMarker(path, 8)
      t.upsert((1 to 24).map(i => (i.toLong, i * 100)).toDF("id", "v"))
      t.delete("id > 40")
      def rows() = t.toDF.collect().map(_.toString).sorted.toSeq
      val split = rows()
      graft.read.GraftRead.forceCrossBucketRead = true
      val cross = try rows()
        finally graft.read.GraftRead.forceCrossBucketRead = false
      assert(split == cross, s"split vs cross diverged\nsplit:\n" +
        s"${split.mkString("\n")}\ncross:\n${cross.mkString("\n")}")
      assert(split.length == 40)
    }
  }

  test("repair() rolls a crashed re-bucket forward and restores fast paths") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        (1 to 32).map(i => (i.toLong, i)).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 2)
      forgeOpenMarker(path, 4)
      t.upsert(Seq((1L, 100), (33L, 33)).toDF("id", "v"))
      // degraded-but-correct before repair; bucketed join refuses loudly
      val e = intercept[IllegalArgumentException](t.bucketedJoin(t))
      assert(e.getMessage.contains("repair"), e.getMessage)
      assert(t.repair(), "an open marker needs repair")
      assert(!graft.meta.RebucketLog.hasOpen(t.info.properties))
      assert(!t.repair(), "repair must be idempotent-quiet")
      assert(t.toDF.count() == 33)
      assert(t.toDF.filter($"id" === 1L).select("v")
        .collect().map(_.getInt(0)).toSeq == Seq(100))
      // the fast path is back: bucketed join runs shuffle-free again
      assert(t.bucketedJoin(t).count() == 33)
      assert(t.validate() == Nil)
    }
  }

  test("CALL graft.repair completes an unfinished restore") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        (1 to 12).map(i => (i.toLong, i)).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 2)
      Thread.sleep(3)
      val ts1 = t.lastCommitTs
      t.compaction(CompactionOptions(newBucketNum = Some(4)), _ => true)
      // crash the count-flipping restore at the flip point
      var calls = 0
      intercept[RuntimeException] {
        MetaStore.default.restoreTable(path, ts1, infoUpdate = Some { cur =>
          calls += 1
          if (calls == 2) throw new RuntimeException("simulated crash")
          cur.copy(bucketNum = 2)
        })
      }
      intercept[IllegalStateException](t.upsert(Seq((2L, 22)).toDF("id", "v")))
      val msg = spark.sql(
        s"CALL graft.repair(table_path => '${t.path}')").collect()
      assert(msg.map(_.getString(0)).exists(_.contains("repaired")),
        msg.mkString(","))
      assert(!t.info.properties.contains(MetaStore.RestorePendingProp))
      assert(t.info.bucketNum == 2)
      t.upsert(Seq((2L, 22)).toDF("id", "v"))
      assert(t.toDF.count() == 12)
      assert(t.validate() == Nil)
    }
  }

  test("r17 pin: full compaction after a crashed flip re-shuffles to the " +
    "new mapping (alignment refused for a non-current single epoch)") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        (1 to 64).map(i => (i.toLong, i)).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 2)
      // second run in every bucket so the merge read covers ALL groups —
      // the exact precondition under which compaction may claim alignment
      t.upsert((1 to 64).map(i => (i.toLong, i * 10)).toDF("id", "v"))
      // crashed UP-re-bucket 2 -> 4: count flipped + open marker, no rewrite
      forgeOpenMarker(path, 4)
      // roll-forward: plain full compaction must RE-SHUFFLE to the new
      // mapping (a write keeping the old-mapping placement would stamp
      // old bucket ids into a 4-bucket table: duplicate pks after the
      // next upsert, missed bucket-pruned point reads)
      t.compaction()
      assert(t.info.bucketNum == 4)
      assert(t.liveFiles.forall(f => f.file.bucketId >= 0 && f.file.bucketId < 4),
        s"stale bucket ids: ${t.liveFiles.map(_.file.bucketId).distinct}")
      // bucket ids must be the CURRENT mapping's, not just in range
      t.liveFiles.foreach { f =>
        val ids = spark.read.parquet(f.file.path).select("id").collect().map(_.getLong(0))
        ids.foreach { id =>
          val want = graft.write.TransactionalWrite.bucketOf(
            spark, t.schema, Seq("id" -> id), 4)
          assert(want == f.file.bucketId,
            s"id=$id in bucket ${f.file.bucketId}, current mapping says $want")
        }
      }
      t.upsert((1 to 32).map(i => (i.toLong, i * 100)).toDF("id", "v"))
      assert(t.toDF.count() == 64, "duplicate keys after roll-forward")
      assert(t.toDF.filter($"id" === 7L).collect().map(_.getInt(1)).toSeq == Seq(700))
      assert(t.validate() == Nil)
    }
  }
}
