package graft

import org.apache.spark.sql.functions._
import graft.pipeline.VectorIndex
import graft.tables.GraftTable

class PruningSuite extends SparkFixture {
  import spark.implicits._

  test("toDFWherePartitions prunes partitions by typed predicate") {
    withTempPath { path =>
      val df = (1 to 30).map(i => (i % 3, i, i * 10)).toDF("bucket3", "id", "v")
      val t = GraftTable.create(spark, df, path,
        rangeColumns = Seq("bucket3"), hashColumns = Seq("id"), bucketNum = 2)
      val out = t.toDFWherePartitions($"bucket3" >= 1)
      assert(out.count() == 20)
      assert(out.select("bucket3").distinct().collect().map(_.getInt(0)).toSet == Set(1, 2))
    }
  }

  test("format(graft): range-eq filter prunes partitions, pk-eq prunes buckets") {
    withTempPath { path =>
      val df = (1 to 40).map(i => (s"p${i % 4}", i.toLong, i)).toDF("r", "id", "v")
      df.write.format("graft")
        .option("rangePartitions", "r")
        .option("hashPartitions", "id").option("hashBucketNum", "4")
        .save(path)
      val rel = spark.read.format("graft").load(path)
      // range pruning via filter pushdown
      assert(rel.filter($"r" === "p2").count() == 10)
      // IN on the range column prunes too (value-set pruning), and an
      // intersecting equality narrows it further
      assert(rel.filter($"r".isin("p1", "p3")).count() == 20)
      assert(rel.filter($"r".isin("p1", "p3") && $"r" === "p3").count() == 10)
      assert(rel.filter($"r".isin("p1", "p3") && $"r" === "p2").count() == 0)
      // pk point lookup (bucket-pruned) still returns the right row
      val row = rel.filter($"id" === 17L).collect()
      assert(row.length == 1 && row.head.getAs[Int]("v") == 17)
    }
  }

  test("date-range scan over a string-partitioned table prunes and stays correct") {
    withTempPath { path =>
      val days = Seq("2026-01-01", "2026-01-02", "2026-02-01", "2026-02-02")
      val df = (0 until 40).map(i => (days(i % 4), i.toLong, i)).toDF("dt", "id", "v")
      df.write.format("graft").option("rangePartitions", "dt").save(path)
      val rel = spark.read.format("graft").load(path)
      assert(rel.filter($"dt" >= "2026-01-01" && $"dt" < "2026-02-01").count() == 20)
      assert(rel.filter($"dt".startsWith("2026-02")).count() == 20)
      assert(rel.filter($"dt" > "2026-01-02" && $"dt" <= "2026-02-01").count() == 10)
      // combined with equality: the pinned desc excluded by ordering -> empty
      assert(rel.filter($"dt" === "2026-01-01" && $"dt" > "2026-01-15").count() == 0)
    }
  }

  test("IS NULL on the range column prunes to the null-sentinel partition") {
    withTempPath { path =>
      Seq((Some("a"), 1), (None, 2), (None, 3), (Some("b"), 4)).toDF("r", "v")
        .write.format("graft").option("rangePartitions", "r").save(path)
      val rel = spark.read.format("graft").load(path)
      assert(rel.filter($"r".isNull).count() == 2)
      assert(rel.filter($"r" <=> "a").count() == 1)
      assert(rel.filter($"r".isNull || $"r" === "b").count() == 3) // OR: no prune, still correct
    }
  }

  test("snapshot read with pinned partition resolves by point lookup") {
    withTempPath { path =>
      val df = (1 to 20).map(i => (s"p${i % 2}", i.toLong, i)).toDF("r", "id", "v")
      val t = GraftTable.create(spark, df, path,
        rangeColumns = Seq("r"), hashColumns = Seq("id"), bucketNum = 2)
      val ts1 = t.lastCommitTs
      t.upsert((1 to 20).map(i => (s"p${i % 2}", i.toLong, i + 100)).toDF("r", "id", "v"))
      // time travel + range-equality filter -> filesUptoTimeForDescs path
      val snap = spark.read.format("graft")
        .option("readtype", "snapshot").option("readendtime", ts1.toString)
        .load(path).filter($"r" === "p1")
      assert(snap.count() == 10)
      assert(snap.agg(max("v")).head.getInt(0) <= 20, "snapshot must pre-date upsert")
      assert(spark.read.format("graft").load(path).filter($"r" === "p1")
        .agg(max("v")).head.getInt(0) > 100, "current read sees the upsert")
    }
  }

  test("incremental read with pinned partition resolves per-desc") {
    withTempPath { path =>
      val df = (1 to 20).map(i => (s"p${i % 2}", i.toLong, i)).toDF("r", "id", "v")
      val t = GraftTable.create(spark, df, path,
        rangeColumns = Seq("r"), hashColumns = Seq("id"), bucketNum = 2)
      val ts1 = t.lastCommitTs
      t.upsert(Seq(("p1", 101L, 1), ("p0", 102L, 2)).toDF("r", "id", "v"))
      val inc = spark.read.format("graft")
        .option("readtype", "incremental")
        .option("readstarttime", ts1.toString)
        .load(path).filter($"r" === "p1")
      assert(inc.select("id").as[Long].collect().toSet == Set(101L))
      // nonexistent pinned partition -> empty, no error
      assert(spark.read.format("graft")
        .option("readtype", "incremental")
        .option("readstarttime", ts1.toString)
        .load(path).filter($"r" === "nope").count() == 0)
    }
  }

  test("DML pinned-partition fast path: update/delete target one partition") {
    withTempPath { path =>
      val df = (1 to 40).map(i => (s"p${i % 4}", i.toLong, i)).toDF("r", "id", "v")
      val t = GraftTable.create(spark, df, path,
        rangeColumns = Seq("r"), hashColumns = Seq("id"), bucketNum = 2)
      // string range column pinned by equality -> point-lookup fast path
      t.update(col("r") === "p1" && col("v") < 20, Map("v" -> lit(-1)))
      val after = t.toDF.select("r", "id", "v").as[(String, Long, Int)].collect()
      assert(after.count(x => x._3 == -1) == 5) // p1 rows with v < 20: 1,5,9,13,17
      assert(after.filter(_._1 != "p1").forall(_._3 > 0), "other partitions untouched")
      t.delete(col("r") === "p3" && col("v") > 30)
      assert(t.toDF.filter(col("r") === "p3").count() == 7) // 10 - {31,35,39}
      // pinned desc that does not exist -> no-op, no error
      t.delete(col("r") === "nope" && col("v") > 0)
      assert(t.toDF.count() == 37)
    }
  }

  test("DSv2 catalog: IN filter on the range column resolves exact descs") {
    withTempPath { wh =>
      spark.conf.set("spark.sql.catalog.graft_cat", "graft.catalog.GraftCatalogV2")
      spark.conf.set("spark.graft.warehouse", wh)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft_cat.pr")
      try {
        spark.sql(
          "CREATE TABLE graft_cat.pr.t (r STRING, id BIGINT, v INT) " +
            "PARTITIONED BY (r)")
        (0 until 4).foreach(p => spark.sql(
          s"INSERT INTO graft_cat.pr.t SELECT 'p$p', id, CAST(id AS INT) " +
            s"FROM range(10)"))
        assert(spark.sql(
          "SELECT count(*) FROM graft_cat.pr.t WHERE r IN ('p1','p3')")
          .head.getLong(0) == 20)
        assert(spark.sql(
          "SELECT count(*) FROM graft_cat.pr.t WHERE r IN ('p1','p3') AND r = 'p2'")
          .head.getLong(0) == 0)
      } finally spark.sql("DROP TABLE IF EXISTS graft_cat.pr.t")
    }
  }

  test("persisted IVF vector index: build once, search probes few cells") {
    withTempPath { base =>
      val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val idx = VectorIndex.build(spark, embs, base, "vec_id", "embedding", nlist = 8)
      val q = embs.filter($"vec_id" === 3).select("embedding")
        .head.getSeq[Float](0).toArray
      val hits = idx.search(q, k = 5, nprobe = 4).collect()
      assert(hits.nonEmpty && hits.head.getLong(0) == 3L) // self found first
      // reopen from disk
      val again = VectorIndex.forPath(spark, base, "vec_id", "embedding")
        .search(q, 5, 4).collect()
      assert(again.map(_.getLong(0)).toSeq == hits.map(_.getLong(0)).toSeq)

      // quantized search agrees on the easy hits and self
      val bq = VectorIndex.forPath(spark, base, "vec_id", "embedding")
        .searchQuantized(q, k = 5, nprobe = 8, refine = 8).collect()
      assert(bq.head.getLong(0) == 3L, "self must rank first under BQ")

      // incremental append: new vectors join the index as delta upserts
      // and are immediately searchable — no rebuild
      val shifted = embs.filter($"vec_id" < 20)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
      VectorIndex.forPath(spark, base, "vec_id", "embedding").append(shifted)
      val afterAppend = VectorIndex.forPath(spark, base, "vec_id", "embedding")
        .search(q, k = 2, nprobe = 8).collect().map(_.getLong(0)).toSet
      // vec 3's exact copy (id 100003) now ties it at cosine 1.0
      assert(afterAppend == Set(3L, 100003L), s"got $afterAppend")

      // the BQ pre-rank scan must NOT read the vector column — including on
      // the now multi-run index, where the merge path decodes only the
      // requested columns (the searchQuantized read shape)
      val skinny = graft.tables.GraftTable
        .forPath(spark, s"$base/_g_vecindex")
        .toDF(_ => true, Seq("vec_id", "cell", "bqcode", "bqnorm"))
      val scanPlan = skinny.queryExecution.executedPlan.toString
      assert(!scanPlan.contains("embedding"),
        s"BQ pre-rank scan should prune the vector column:\n$scanPlan")
      // quantized search stays correct over base + appended delta runs
      val bq2 = VectorIndex.forPath(spark, base, "vec_id", "embedding")
        .searchQuantized(q, k = 2, nprobe = 8, refine = 8)
        .collect().map(_.getLong(0)).toSet
      assert(bq2 == Set(3L, 100003L), s"got $bq2")
    }
  }
}
