package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.mergeop.{MergeOp, MergeOps}
import graft.tables.GraftTable

/** Reference-API parity surface (LakeSoulTable.scala): string-expression
  * DML overloads, the fluent TableCreator builder, TTL setters + sweeps,
  * partition-scoped cleanup/snapshot helpers, cache invalidation, and
  * class-name merge-operator registration. A reference user switching over
  * should find these exact entry points. */
class ApiParitySuite extends SparkFixture {
  import spark.implicits._

  test("updateExpr / delete with SQL-string conditions") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("id", "v", "x"),
        path, hashColumns = Seq("id"), bucketNum = 1)
      t.updateExpr("id = 2", Map("x" -> "x + 5"))
      assertRows(t.toDF.select("id", "x"), Seq("[1,10.0]", "[2,25.0]", "[3,30.0]"))
      // unconditional updateExpr hits every row
      t.updateExpr(Map("x" -> "x * 2"))
      assertRows(t.toDF.select("id", "x"), Seq("[1,20.0]", "[2,50.0]", "[3,60.0]"))
      t.delete("v = 'a'")
      assertRows(t.toDF.select("id"), Seq("[2]", "[3]"))
    }
  }

  test("compaction(condition) scopes to matching range partitions") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        Seq((1, "p1", 10), (2, "p2", 20)).toDF("id", "part", "v"), path,
        rangeColumns = Seq("part"), hashColumns = Seq("id"), bucketNum = 1)
      t.upsert(Seq((1, "p1", 11), (2, "p2", 21)).toDF("id", "part", "v"))
      t.compaction("part = 'p1'")
      val runs = t.partitions.map(p => p.partitionDesc -> p.snapshot.size).toMap
      assert(runs("part=p1") == 1, s"p1 should be compacted: $runs")
      assert(runs("part=p2") == 2, s"p2 must be untouched: $runs")
      assertRows(t.toDF.select("id", "v"), Seq("[1,11]", "[2,21]"))
    }
  }

  test("forPathPartitionVersion reads one partition at a pinned version") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        Seq((1, "p1", 10), (2, "p2", 20)).toDF("id", "part", "v"), path,
        rangeColumns = Seq("part"), hashColumns = Seq("id"), bucketNum = 1)
      t.upsert(Seq((1, "p1", 11)).toDF("id", "part", "v"))
      t.upsert(Seq((1, "p1", 12)).toDF("id", "part", "v"))
      // p1 versions: 0 (create), 1, 2 — pin each
      assertRows(GraftTable.forPathPartitionVersion(spark, path, "part=p1", 0)
        .select("id", "v"), Seq("[1,10]"))
      assertRows(GraftTable.forPathPartitionVersion(spark, path, "part=p1", 1)
        .select("id", "v"), Seq("[1,11]"))
      assertRows(t.snapshotAtPartitionVersion("part=p1", 2)
        .select("id", "v"), Seq("[1,12]"))
      val e = intercept[IllegalArgumentException](
        t.snapshotAtPartitionVersion("part=p1", 9))
      assert(e.getMessage.contains("no version"), e.getMessage)
    }
  }

  test("upsert(source, condition) scopes the upsert like the reference") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        Seq((1, "p1", 10), (2, "p1", 20), (3, "p2", 30)).toDF("id", "part", "v"),
        path, rangeColumns = Seq("part"), hashColumns = Seq("id"), bucketNum = 1)
      // batch touches both partitions; the condition limits it to p1
      t.upsert(Seq((1, "p1", 11), (3, "p2", 99)).toDF("id", "part", "v"),
        "part = 'p1'")
      assertRows(t.toDF.select("id", "v"), Seq("[1,11]", "[2,20]", "[3,30]"))
      // empty condition = plain upsert
      t.upsert(Seq((3, "p2", 99)).toDF("id", "part", "v"), "")
      assertRows(t.toDF.select("id", "v"), Seq("[1,11]", "[2,20]", "[3,99]"))
    }
  }

  test("reference accessor/alias parity: data/path/as/alias/truncateTable/registerMergeOperator") {
    withTempPath { path =>
      val t = GraftTable.create(spark, Seq((1, "a")).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 1)
      assert(t.path == t.tablePath)
      assert(t.data.collect().length == 1)
      // aliased handle: toDF carries the alias, operations hit the table
      val al = t.as("x")
      assert(al.toDF.select(col("x.v")).head.getString(0) == "a")
      al.upsert(Seq((2, "b")).toDF("id", "v"))
      assert(t.toDF.count() == 2)
      assert(t.alias("y").toDF.select(col("y.id")).count() == 2)
      t.truncateTable()
      assert(t.toDF.count() == 0)
      // companion registration by class name (signature parity)
      GraftTable.registerMergeOperator(spark,
        classOf[ParityMinOp].getName, "pp_min")
      assert(graft.mergeop.MergeOps.forName("pp_min").name == "pp_min")
    }
  }

  test("newCompaction: string size limit, cleanOldCompaction deletes superseded files") {
    withTempPath { path =>
      val t = GraftTable.create(spark, Seq((1, 1)).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 1)
      (2 to 5).foreach(i => t.upsert(Seq((i, i)).toDF("id", "v")))
      assert(t.partitions.map(_.snapshot.size).max == 5)
      val filesBefore = new java.io.File(path).listFiles()
        .count(_.getName.endsWith(".parquet"))
      t.newCompaction(fileSizeLimit = Some("1GB"), cleanOldCompaction = true)
      assert(t.partitions.map(_.snapshot.size).max == 1)
      assertRows(t.toDF.select("id", "v"),
        (1 to 5).map(i => s"[$i,$i]"))
      // superseded delta files physically deleted
      def countParquet(d: java.io.File): Int =
        Option(d.listFiles()).toSeq.flatten.flatMap(f =>
          if (f.isDirectory) Seq(countParquet(f)) else
            Seq(if (f.getName.endsWith(".parquet")) 1 else 0)).sum
      assert(countParquet(new java.io.File(path)) < filesBefore + 5,
        "cleanOldCompaction must delete superseded files")
    }
  }

  test("cleanOldCompaction never touches partitions the pass skipped") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        Seq((1L, "p1", 1), (2L, "p2", 2)).toDF("id", "part", "v"), path,
        rangeColumns = Seq("part"), hashColumns = Seq("id"), bucketNum = 1)
      // p1 gets a deep backlog; p2 only a single rewrite (old file
      // superseded — history cleanOldCompaction must NOT destroy)
      (1 to 4).foreach(i => t.upsert(Seq((1L, "p1", i * 10)).toDF("id", "part", "v")))
      t.update(col("id") === 2L, Map("v" -> lit(99)))
      val p2PreTs = t.history.map(_._2).max
      Thread.sleep(3)
      // fileNumLimit=4: p1 (5 runs) compacts, p2 (2 versions, 1-run head) skipped
      t.newCompaction(fileNumLimit = Some(4), cleanOldCompaction = true)
      val runs = t.partitions.map(p => p.partitionDesc -> p.snapshot.size).toMap
      assert(runs("part=p1") == 1, runs)
      // p2's pre-update version must still time-travel (its old file alive)
      val old2 = t.snapshotAt(p2PreTs).filter(col("id") === 2L)
        .select("v").head.getInt(0)
      assert(old2 == 99, "boundary check") // head at that ts
      assert(t.toDF.count() == 2)
      // and the FULL history of p2 before the update is intact
      val hist = t.history
      val preUpdateTs = hist(hist.size - 3)._2 // before update + compaction
      assert(t.snapshotAt(preUpdateTs).filter(col("id") === 2L)
        .select("v").head.getInt(0) == 2,
        "cleanOldCompaction deleted a skipped partition's history")
    }
  }

  test("onlySaveOnceCompaction skips single-run partitions on re-compaction") {
    withTempPath { path =>
      val t = GraftTable.create(spark, Seq((1, 1)).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 1)
      t.upsert(Seq((2, 2)).toDF("id", "v"))
      t.onlySaveOnceCompaction(true)
      t.compaction()
      val versionsAfterFirst = t.history.size
      t.compaction() // single-run now: must be a no-op commit-wise
      assert(t.history.size == versionsAfterFirst,
        "re-compaction of a single-run partition must not re-save")
      assertRows(t.toDF.select("id", "v"), Seq("[1,1]", "[2,2]"))
    }
  }

  test("upsert(source, condition) on a TARGET-only column is scoping-inert, unknown columns fail") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        Seq((1, "p1", 10, 5), (2, "p1", 20, 6)).toDF("id", "part", "v", "w"),
        path, rangeColumns = Seq("part"), hashColumns = Seq("id"), bucketNum = 1)
      // the partial batch has no `w`; the reference drops non-range
      // conjuncts from scoping rather than erroring (UpsertCommand
      // targetOnlyPredicates filter) — the range conjunct still applies
      t.upsert(Seq((1, "p1", 11), (2, "p2", 99)).toDF("id", "part", "v"),
        "part = 'p1' AND w > 0")
      assertRows(t.toDF.select("id", "v", "w"), Seq("[1,11,5]", "[2,20,6]"))
      // a column neither side knows is a loud error, not silence
      val e = intercept[IllegalArgumentException](
        t.upsert(Seq((1, "p1", 12)).toDF("id", "part", "v"), "nope = 1"))
      assert(e.getMessage.contains("unknown column"), e.getMessage)
    }
  }

  test("upsert(source, condition) with no range conjunct is rejected on a partitioned table") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        Seq((1, "p1", 10), (2, "p2", 20)).toDF("id", "part", "v"),
        path, rangeColumns = Seq("part"), hashColumns = Seq("id"), bucketNum = 1)
      // reference UpsertCommand.scala:110-115: partitioned table + no
      // range-only conjunct -> upsertConditionNotFoundException unless
      // ALLOW_FULL_TABLE_UPSERT; `v > 0` scopes no partitions
      val e = intercept[IllegalArgumentException](
        t.upsert(Seq((1, "p1", 11)).toDF("id", "part", "v"), "v > 0"))
      assert(e.getMessage.contains("allowFullTableUpsert"), e.getMessage)
      // a mixed condition carries a range conjunct -> allowed
      t.upsert(Seq((1, "p1", 11), (2, "p2", 99)).toDF("id", "part", "v"),
        "part = 'p1' AND v > 0")
      assertRows(t.toDF.select("id", "v"), Seq("[1,11]", "[2,20]"))
      // the conf opens the escape hatch (reference ALLOW_FULL_TABLE_UPSERT)
      spark.conf.set("spark.graft.allowFullTableUpsert", "true")
      try {
        t.upsert(Seq((2, "p2", 88)).toDF("id", "part", "v"), "v > 0")
        assertRows(t.toDF.select("id", "v"), Seq("[1,11]", "[2,88]"))
      } finally spark.conf.unset("spark.graft.allowFullTableUpsert")
      // an UNpartitioned table never needs the guard
      val u = GraftTable.create(spark, Seq((1, 10)).toDF("id", "v"),
        path + "-u", hashColumns = Seq("id"), bucketNum = 1)
      u.upsert(Seq((1, 11)).toDF("id", "v"), "v > 0")
      assertRows(u.toDF, Seq("[1,11]"))
    }
  }

  test("time-based rollbackPartition resolves the version at-or-before") {
    withTempPath { path =>
      val t = GraftTable.create(spark, Seq((1, "a")).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 1)
      Thread.sleep(50)
      val mid = System.currentTimeMillis()
      Thread.sleep(50)
      t.upsert(Seq((1, "a2")).toDF("id", "v"))
      assertRows(t.toDF, Seq("[1,a2]"))
      val toTime = java.time.LocalDateTime
        .ofInstant(java.time.Instant.ofEpochMilli(mid),
          java.time.ZoneId.of("UTC"))
        .format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
      t.rollbackPartition(graft.meta.TableInfo.RootPartition, toTime, "UTC")
      assertRows(t.toDF, Seq("[1,a]"))
      // a time before every version is a no-op (reference behavior)
      t.rollbackPartition(graft.meta.TableInfo.RootPartition,
        "1970-01-02 00:00:00", "UTC")
      assertRows(t.toDF, Seq("[1,a]"))
    }
  }

  test("TableCreator builder creates, registers name, sets properties") {
    withTempPath { path =>
      val df = Seq((1, "x", "p1"), (2, "y", "p2")).toDF("id", "v", "part")
      val t = GraftTable.createTable(df, path)
        .rangePartitions("part")
        .hashPartitions("id")
        .hashBucketNum("2")
        .shortTableName("parity_builder_t")
        .tableProperty("graft.custom" -> "yes")
        .create()
      assert(t.info.rangeColumns == Seq("part"))
      assert(t.info.hashColumns == Seq("id"))
      assert(t.info.bucketNum == 2)
      assert(t.info.properties("graft.custom") == "yes")
      val byName = GraftTable.forName(spark, "parity_builder_t")
      assertSameRows(byName.toDF, df)
      assert(GraftTable.isGraftTable(path))
    }
  }

  test("TTL fluent setters and redundant-data sweep") {
    withTempPath { path =>
      val t = GraftTable.create(spark, (1 to 50).map(i => (i, i)).toDF("id", "v"),
        path, hashColumns = Seq("id"), bucketNum = 1)
        .setPartitionTtl(7).setCompactionTtl(0)
      assert(t.info.properties("graft.partition.ttl.days") == "7")
      assert(t.info.properties("graft.compaction.ttl.days") == "0")
      // create redundant files: upsert + compact, then sweep with ttl=0 days
      t.upsert(Seq((1, 100)).toDF("id", "v"))
      t.compaction()
      val swept = t.cleanExpiredRedundantData()
      assert(swept > 0, s"expected the pre-compaction files gone, deleted=$swept")
      assertRows(t.toDF.filter($"id" === 1).select("v"), Seq("[100]"))
      t.cancelPartitionTtl().cancelCompactionTtl()
      assert(!t.info.properties.contains("graft.partition.ttl.days"))
      assert(!t.info.properties.contains("graft.compaction.ttl.days"))
      assert(t.cleanExpiredRedundantData() == 0L) // unset -> no-op
    }
  }

  test("cleanupPartitionData deletes one partition's superseded files only") {
    withTempPath { path =>
      val df = Seq((1, "p1", 1), (2, "p2", 1)).toDF("id", "part", "v")
      val t = GraftTable.create(spark, df, path,
        rangeColumns = Seq("part"), hashColumns = Seq("id"), bucketNum = 1)
      // supersede p1's initial file via compaction after an upsert
      val tsAfterCreate = t.lastCommitTs
      t.upsert(Seq((1, "p1", 2)).toDF("id", "part", "v"))
      val tsAfterUpsert = t.lastCommitTs
      t.compaction(_ == "part=p1")
      val beforeP2 = t.liveFiles.filter(_.partitionDesc == "part=p2").map(_.file.path)
      // boundary at the CREATE time: the upsert delta (after the boundary)
      // must stay readable for time travel even though compaction
      // superseded it — only files exclusively owned by <= boundary
      // versions are deletable
      val deletedEarly = t.cleanupPartitionData("part=p1", tsAfterCreate)
      assertRows(t.snapshotAt(tsAfterUpsert, _ == "part=p1").select("id", "v"),
        Seq("[1,2]"))
      // boundary NOW: the superseded files go
      val deleted = t.cleanupPartitionData("part=p1", System.currentTimeMillis())
      assert(deletedEarly + deleted > 0)
      // p2 untouched on disk, current read still correct
      beforeP2.foreach(p => assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
      assertRows(t.toDF.select("id", "v"), Seq("[1,2]", "[2,1]"))
    }
  }

  test("forPathSnapshot / forPathIncremental with a partition scope") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        Seq((1, "p1", 1), (2, "p2", 1)).toDF("id", "part", "v"), path,
        rangeColumns = Seq("part"), hashColumns = Seq("id"), bucketNum = 1)
      val ts1 = t.lastCommitTs
      t.upsert(Seq((1, "p1", 2), (3, "p2", 1)).toDF("id", "part", "v"))
      val snap = GraftTable.forPathSnapshot(spark, path, ts1, "part=p1")
      assertRows(snap.select("id", "v"), Seq("[1,1]"))
      val incr = GraftTable.forPathIncremental(spark, path, ts1,
        t.lastCommitTs, "part=p2")
      assertRows(incr.select("id", "v"), Seq("[3,1]"))
    }
  }

  test("uncached drops snapshot cache; next read re-resolves") {
    withTempPath { path =>
      val t = GraftTable.create(spark, Seq((1, 1)).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 1)
      t.toDF.count()
      GraftTable.uncached(path) // must not throw, next read still correct
      assertRows(t.toDF, Seq("[1,1]"))
    }
  }

  test("merge operator registered by class name under a custom fun name") {
    MergeOps.register("parity_min", classOf[ParityMinOp].getName)
    withTempPath { path =>
      val t = GraftTable.create(spark, Seq((1, 10), (2, 5)).toDF("id", "v"),
        path, hashColumns = Seq("id"), bucketNum = 1,
        properties = Map("graft.mergeop.v" -> "parity_min"))
      t.upsert(Seq((1, 3), (2, 8)).toDF("id", "v"))
      assertRows(t.toDF, Seq("[1,3]", "[2,5]"))
    }
  }
}

/** No-arg MergeOp used by the class-name registration test (must be a
  * top-level class so `Class.forName(...).newInstance` can build it). */
class ParityMinOp extends MergeOp {
  val name = "parity_min_self"
  def agg(value: Column, version: Column, present: Column, dt: DataType): Column =
    min(when(present, value))
}
