package graft

import graft.meta.MetaStore
import graft.tables.{CompactionOptions, GraftTable}

/** r16 advice pins — mapping-consistency gates on the DSv2 catalog scan
  * and the file-store restore marker:
  *
  *  1. a readtype=incremental window straddling a re-bucket must not
  *     per-bucket dispatch (a straddling key's old- and new-mapping rows
  *     would land in different merge tasks and BOTH surface);
  *  2. a time-travel snapshot resolved BEFORE a completed re-bucket must
  *     not point-prune with the CURRENT bucket count (old-mapping ids all
  *     look in-range after an up-re-bucket — the prune scans the wrong
  *     bucket and silently drops rows);
  *  3. a bucket-neutral file-store restore must not open the
  *     writer-blocking RESTORE-PENDING crash window (no count flip = no
  *     mapping ambiguity to protect). */
class ScanMappingGateSuite extends SparkFixture {
  import spark.implicits._

  private def useCatalog(wh: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.catalog.GraftCatalogV2")
    spark.conf.set("spark.graft.warehouse", wh)
  }

  test("DSv2 incremental window straddling a re-bucket merges each key once") {
    for (down <- Seq(false, true)) {
      withTempPath { wh =>
        useCatalog(wh)
        val ns = if (down) "rsd" else "rsu"
        spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft_cat.$ns")
        (1 to 16).map(i => (i.toLong, i)).toDF("id", "v")
          .createOrReplaceTempView("straddle_src")
        val (n0, n1) = if (down) (4, 2) else (2, 4)
        spark.sql(s"CREATE TABLE graft_cat.$ns.t PARTITIONED BY " +
          s"(bucket($n0, id)) AS SELECT * FROM straddle_src")
        val t = GraftTable.forName(spark, s"$ns.t")
        Thread.sleep(3)
        t.compaction(CompactionOptions(newBucketNum = Some(n1)), _ => true)
        Thread.sleep(3)
        // post-re-bucket delta touching HALF the keys: those keys now have
        // old-mapping AND new-mapping rows inside the window
        t.upsert((1 to 8).map(i => (i.toLong, i * 100)).toDF("id", "v"))
        val inc = spark.read.option("readtype", "incremental")
          .option("readstarttime", "0").table(s"graft_cat.$ns.t")
        assertRows(inc, (1 to 8).map(i => s"[$i,${i * 100}]") ++
          (9 to 16).map(i => s"[$i,$i]"))
        // the same window through the library path (already guarded) agrees
        assertSameRows(inc, t.incremental(0L, t.lastCommitTs))
      }
    }
  }

  test("snapshot before a completed up-re-bucket: PK point lookups find every key") {
    withTempPath { wh =>
      useCatalog(wh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.tts")
      (1 to 16).map(i => (i.toLong, i)).toDF("id", "v")
        .createOrReplaceTempView("ttsnap_src")
      spark.sql("CREATE TABLE graft_cat.tts.t PARTITIONED BY " +
        "(bucket(2, id)) AS SELECT * FROM ttsnap_src")
      val t = GraftTable.forName(spark, "tts.t")
      val ts1 = t.lastCommitTs
      Thread.sleep(3)
      t.compaction(CompactionOptions(newBucketNum = Some(4)), _ => true)
      // the snapshot's files carry the OLD (2-bucket) mapping; a point
      // prune under the current 4-bucket count scans the wrong bucket for
      // roughly half the keys — every lookup must still find its row
      for (k <- 1 to 16) {
        assertRows(spark.read.option("readtype", "snapshot")
          .option("readendtime", ts1.toString).table("graft_cat.tts.t")
          .where(s"id = $k"), Seq(s"[$k,$k]"))
      }
      // a snapshot AT/AFTER the re-bucket keeps the optimization valid
      for (k <- Seq(3, 11)) {
        assertRows(spark.read.option("readtype", "snapshot")
          .option("readendtime", t.lastCommitTs.toString)
          .table("graft_cat.tts.t").where(s"id = $k"), Seq(s"[$k,$k]"))
      }
    }
  }

  test("bucket-neutral file-store restore crash leaves writers unblocked") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        (1 to 12).map(i => (i.toLong, i)).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 2)
      Thread.sleep(3)
      val ts1 = t.lastCommitTs
      t.upsert(Seq((1L, 111), (20L, 20)).toDF("id", "v"))
      // crash simulation: the infoUpdate's REAL run (second call — the
      // first is the store's bucket-flip dry run) dies at the flip point,
      // i.e. after the heads moved but before the final info write
      var calls = 0
      intercept[RuntimeException] {
        MetaStore.default.restoreTable(path, ts1, infoUpdate = Some { cur =>
          calls += 1
          if (calls == 2) throw new RuntimeException("simulated crash")
          cur // bucket-neutral: same count back
        })
      }
      assert(calls == 2, "dry run + real run expected")
      // no count flip was pending, so no marker — writers proceed (before
      // the fix: IllegalStateException until a manual restore re-run)
      assert(!t.info.properties.contains(MetaStore.RestorePendingProp),
        "bucket-neutral restore must not set the pending marker")
      t.upsert(Seq((2L, 222)).toDF("id", "v"))
      assert(t.toDF.count() == 12, "heads restored to the boundary + upsert merged")
      assert(t.toDF.filter($"id" === 2L).select("v")
        .collect().map(_.getInt(0)).toSeq == Seq(222))
      assert(t.validate() == Nil)
    }
  }

  test("bucket-flipping file-store restore crash still blocks writers until re-run") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        (1 to 12).map(i => (i.toLong, i)).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 2)
      Thread.sleep(3)
      val ts1 = t.lastCommitTs
      t.compaction(CompactionOptions(newBucketNum = Some(4)), _ => true)
      var calls = 0
      intercept[RuntimeException] {
        MetaStore.default.restoreTable(path, ts1, infoUpdate = Some { cur =>
          calls += 1
          if (calls == 2) throw new RuntimeException("simulated crash")
          cur.copy(bucketNum = 2) // the flip the marker protects
        })
      }
      assert(t.info.properties.contains(MetaStore.RestorePendingProp),
        "a crashed count-flipping restore must leave the marker set")
      val e = intercept[IllegalStateException](
        t.upsert(Seq((2L, 222)).toDF("id", "v")))
      assert(e.getMessage.toLowerCase.contains("restore"), e.getMessage)
      // recovery: re-running the restore completes the pair and clears it
      t.restoreToTimestamp(ts1)
      assert(!t.info.properties.contains(MetaStore.RestorePendingProp))
      assert(t.info.bucketNum == 2)
      t.upsert(Seq((2L, 222)).toDF("id", "v"))
      assert(t.toDF.count() == 12)
      assert(t.validate() == Nil)
    }
  }
}
