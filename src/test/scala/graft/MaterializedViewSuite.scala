package graft

import org.apache.spark.sql.functions._

import graft.pipeline.MaterializedView
import graft.pipeline.MaterializedView.Measure
import graft.tables.GraftTable

class MaterializedViewSuite extends SparkFixture {
  import spark.implicits._

  private def facts(n: Int, offset: Int = 0) =
    (offset until offset + n).map(i =>
      (i.toLong, s"k${i % 3}", i * 1.5, i % 7)).toDF("id", "k", "v", "w")

  test("refresh folds only the delta; totals match a full groupBy") {
    withTempPath { dir =>
      val srcPath = s"$dir/src"; val viewPath = s"$dir/view"
      val src = GraftTable.create(spark, facts(30), srcPath)
      MaterializedView.create(spark, srcPath, viewPath,
        keys = Seq("k"),
        measures = Seq(
          Measure("total", "CAST(v AS DECIMAL(18,2))", "sum"),
          Measure("cnt", "1", "count"),
          Measure("vmin", "v", "min"),
          Measure("wmax", "w", "max")))
      MaterializedView.refresh(spark, viewPath)
      src.append(facts(30, offset = 30))
      src.append(facts(40, offset = 60))
      MaterializedView.refresh(spark, viewPath)

      val expected = facts(100).groupBy("k").agg(
        sum($"v".cast("decimal(18,2)")).as("total"),
        count(lit(1)).as("cnt"), min($"v").as("vmin"), max($"w").as("wmax"))
      assertSameRows(MaterializedView.read(spark, viewPath), expected)

      // refresh with no new commits is a no-op (cursor unchanged)
      val cursor = GraftTable.forPath(spark, viewPath)
        .info.properties(MaterializedView.CursorProp)
      MaterializedView.refresh(spark, viewPath)
      assert(GraftTable.forPath(spark, viewPath)
        .info.properties(MaterializedView.CursorProp) == cursor)
    }
  }

  test("mutable view: updates, deletes and overwriting upserts maintain " +
    "the view exactly; vanished groups and all-null sums read like SQL") {
    withTempPath { dir =>
      val srcPath = s"$dir/src"; val viewPath = s"$dir/view"
      // v is Option[Double] -> NULLABLE: the all-null-sum scenario below
      // upserts NULL measure values, which a non-nullable schema rejects
      // at write (the NOT NULL invariant)
      def nfacts(n: Int) = (0 until n).map(i =>
        (i.toLong, s"k${i % 3}", Some(i * 1.5): Option[Double], i % 7))
        .toDF("id", "k", "v", "w")
      val src = GraftTable.create(spark, nfacts(30), srcPath,
        hashColumns = Seq("id"), bucketNum = 2)
      MaterializedView.create(spark, srcPath, viewPath,
        keys = Seq("k"),
        measures = Seq(
          Measure("total", "CAST(v AS DECIMAL(18,2))", "sum"),
          Measure("cnt", "1", "count")),
        mutable = true)
      MaterializedView.refresh(spark, viewPath) // backfill via diff(0, ts]

      def check(): Unit = {
        val expected = src.toDF.groupBy("k").agg(
          sum($"v".cast("decimal(18,2)")).as("total"),
          count(lit(1)).as("cnt"))
        assertSameRows(MaterializedView.read(spark, viewPath), expected)
      }
      check()

      // UPDATE (file-targeted rewrite) + refresh
      src.update(col("id") % 5 === 0, Map("v" -> (col("v") * 10)))
      MaterializedView.refresh(spark, viewPath); check()
      // overwriting upsert (the case insert-only views double-count)
      src.upsert(nfacts(10).withColumn("v", col("v") + 100))
      MaterializedView.refresh(spark, viewPath); check()
      // DELETE a whole group -> the group must VANISH from the view
      src.delete(col("k") === "k1")
      MaterializedView.refresh(spark, viewPath); check()
      assert(!MaterializedView.read(spark, viewPath)
        .select("k").as[String].collect().contains("k1"))
      // drive one group's sum contributions to all-NULL -> SQL sum = NULL
      src.upsert(Seq((0L, "k0", None: Option[Double], 0),
        (3L, "k0", None: Option[Double], 3))
        .toDF("id", "k", "v", "w"))
      src.delete(col("k") === "k0" && col("v").isNotNull)
      MaterializedView.refresh(spark, viewPath); check()
      val k0 = MaterializedView.read(spark, viewPath)
        .filter(col("k") === "k0").select("total", "cnt").head
      assert(k0.isNullAt(0) && k0.getLong(1) == 2, k0)

      // non-invertible measures are rejected at creation
      val e = intercept[IllegalArgumentException] {
        MaterializedView.create(spark, srcPath, s"$dir/view2",
          keys = Seq("k"), measures = Seq(Measure("m", "v", "min")),
          mutable = true)
      }
      assert(e.getMessage.contains("invertible"))
    }
  }

  test("view compaction folds partial rows without changing results") {
    withTempPath { dir =>
      val srcPath = s"$dir/src"; val viewPath = s"$dir/view"
      val src = GraftTable.create(spark, facts(20), srcPath)
      val view = MaterializedView.create(spark, srcPath, viewPath,
        keys = Seq("k"), measures = Seq(
          Measure("total", "CAST(v AS DECIMAL(18,2))", "sum"),
          Measure("vmax", "v", "max")))
      (0 until 4).foreach { i =>
        if (i > 0) src.append(facts(20, offset = i * 20))
        MaterializedView.refresh(spark, viewPath)
      }
      val runs = view.liveFiles.groupBy(f => (f.partitionDesc, f.file.bucketId))
        .values.map(_.map(_.commitOrdinal).distinct.size).max
      assert(runs >= 2, s"expected partial runs before compaction, got $runs")
      val before = MaterializedView.read(spark, viewPath).collect().toSet
      view.compaction()
      assert(MaterializedView.read(spark, viewPath).collect().toSet == before)
      val runsAfter = view.liveFiles.groupBy(f => (f.partitionDesc, f.file.bucketId))
        .values.map(_.map(_.commitOrdinal).distinct.size).max
      assert(runsAfter == 1)
    }
  }

  test("null measures: sum/min/count follow SQL null semantics") {
    withTempPath { dir =>
      val srcPath = s"$dir/src"; val viewPath = s"$dir/view"
      val rows1 = Seq((1L, "a", Some(2.0)), (2L, "a", None), (3L, "b", None))
      val rows2 = Seq((4L, "a", Some(5.0)), (5L, "b", None))
      val src = GraftTable.create(spark,
        rows1.toDF("id", "k", "v"), srcPath)
      MaterializedView.create(spark, srcPath, viewPath,
        keys = Seq("k"), measures = Seq(
          Measure("total", "CAST(v AS DECIMAL(18,2))", "sum"),
          Measure("nonnull", "v", "count"),
          Measure("vmin", "v", "min")))
      MaterializedView.refresh(spark, viewPath)
      src.append(rows2.toDF("id", "k", "v"))
      MaterializedView.refresh(spark, viewPath)
      val got = MaterializedView.read(spark, viewPath)
        .orderBy("k")
        .select($"k", $"total".cast("double"), $"nonnull", $"vmin")
        .collect().map(_.toString).toSeq
      // b is all-null: sum NULL (exact SQL SUM semantics), count 0, min null
      assert(got == Seq("[a,7.0,2,2.0]", "[b,null,0,null]"))
    }
  }

  test("refresh rejects non-incremental source commits") {
    withTempPath { dir =>
      val srcPath = s"$dir/src"; val viewPath = s"$dir/view"
      val src = GraftTable.create(spark, facts(10), srcPath)
      MaterializedView.create(spark, srcPath, viewPath,
        keys = Seq("k"), measures = Seq(Measure("cnt", "1", "count")))
      MaterializedView.refresh(spark, viewPath)
      src.delete(col("w") === 3)
      src.append(facts(5, offset = 10))
      val e = intercept[IllegalArgumentException] {
        MaterializedView.refresh(spark, viewPath)
      }
      assert(e.getMessage.contains("insert-only"))
    }
  }

  test("maintainStream folds micro-batches; same-checkpoint rerun resumes") {
    withTempPath { dir =>
      val srcPath = s"$dir/src"; val viewPath = s"$dir/view"
      val ckpt = s"$dir/ckpt"
      val src = GraftTable.create(spark, facts(30), srcPath)
      src.append(facts(30, offset = 30)) // two commits -> >=1 micro-batch
      MaterializedView.create(spark, srcPath, viewPath,
        keys = Seq("k"), measures = Seq(
          Measure("total", "CAST(v AS DECIMAL(18,2))", "sum"),
          Measure("cnt", "1", "count")))
      val q1 = MaterializedView.maintainStream(spark, viewPath, ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q1.awaitTermination(120000)
      // catch-up run from the SAME checkpoint after two more commits
      src.append(facts(20, offset = 60))
      src.append(facts(20, offset = 80))
      val q2 = MaterializedView.maintainStream(spark, viewPath, ckpt,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q2.awaitTermination(120000)
      val expected = facts(100).groupBy("k").agg(
        sum($"v".cast("decimal(18,2)")).as("total"), count(lit(1)).as("cnt"))
      assertSameRows(MaterializedView.read(spark, viewPath), expected)

      // the view is bound to its checkpoint: batch refresh and a second
      // pipeline are both rejected
      val e1 = intercept[IllegalArgumentException] {
        MaterializedView.refresh(spark, viewPath)
      }
      assert(e1.getMessage.contains("stream-maintained"))
      val e2 = intercept[IllegalStateException] {
        MaterializedView.maintainStream(spark, viewPath, s"$dir/other_ckpt")
      }
      assert(e2.getMessage.contains("different checkpoint"))
    }
  }

  test("approx_distinct measure: sketch unions across refreshes + compaction") {
    withTempPath { dir =>
      val srcPath = s"$dir/src"; val viewPath = s"$dir/view"
      // w = i % 7 -> small per-group cardinality, where HLL is exact
      val src = GraftTable.create(spark, facts(60), srcPath)
      val view = MaterializedView.create(spark, srcPath, viewPath,
        keys = Seq("k"), measures = Seq(
          Measure("dw", "w", "approx_distinct"),
          Measure("cnt", "1", "count")),
        filter = Some("w <> 3"))
      MaterializedView.refresh(spark, viewPath)
      src.append(facts(60, offset = 60)) // same w domain: pure overlap
      MaterializedView.refresh(spark, viewPath)
      val expected = facts(120).filter($"w" =!= 3).groupBy("k")
        .agg(countDistinct($"w").as("dw"), count(lit(1)).as("cnt"))
      assertSameRows(MaterializedView.read(spark, viewPath), expected)
      // compaction folds the sketch runs via the same union
      view.compaction()
      assertSameRows(MaterializedView.read(spark, viewPath), expected)
      // raw sketches stay accessible for cross-view unions
      val raw = MaterializedView.read(spark, viewPath, estimate = false)
      assert(raw.schema("dw").dataType ==
        org.apache.spark.sql.types.BinaryType)
    }
  }

  test("approx_freq measure: CMS folds across refreshes; estimates exact " +
      "at low collision") {
    withTempPath { dir =>
      val srcPath = s"$dir/src"; val viewPath = s"$dir/view"
      graft.functions.GraftFunctions.register(spark)
      val src = GraftTable.create(spark, facts(50), srcPath)
      MaterializedView.create(spark, srcPath, viewPath,
        keys = Seq("k"), measures = Seq(
          Measure("wf", "w", "approx_freq"),
          Measure("cnt", "1", "count")))
      MaterializedView.refresh(spark, viewPath)
      src.append(facts(50, offset = 50))
      MaterializedView.refresh(spark, viewPath)
      GraftTable.forPath(spark, viewPath).compaction()
      // 7 distinct items in a width-2000 sketch: estimates are exact
      val exact = facts(100).groupBy("k", "w").count()
      val est = MaterializedView.read(spark, viewPath)
        .join(exact, "k")
        .select($"k", $"w", $"count",
          graft.functions.GraftFunctions.cmsEstimate(
            $"wf", $"w".cast("string")).as("est"))
      val bad = est.filter($"est" =!= $"count").collect()
      assert(bad.isEmpty, s"CMS mismatches: ${bad.mkString(", ")}")
    }
  }

  test("approx_quantile measure: KLL folds across refreshes; exact below k") {
    withTempPath { dir =>
      val srcPath = s"$dir/src"; val viewPath = s"$dir/view"
      graft.functions.GraftFunctions.register(spark)
      val src = GraftTable.create(spark, facts(60), srcPath)
      MaterializedView.create(spark, srcPath, viewPath,
        keys = Seq("k"), measures = Seq(
          Measure("vq", "v", "approx_quantile"),
          Measure("cnt", "1", "count")))
      MaterializedView.refresh(spark, viewPath)
      src.append(facts(60, offset = 60))
      MaterializedView.refresh(spark, viewPath)
      GraftTable.forPath(spark, viewPath).compaction()
      // < k=200 values per group: the sketch retains every value, so the
      // inclusive-rank quantile equals the exact order statistic
      val got = MaterializedView.read(spark, viewPath)
        .select($"k",
          graft.functions.GraftFunctions.kllQuantile($"vq", lit(0.5)).as("p50"),
          graft.functions.GraftFunctions.kllQuantile($"vq", lit(1.0)).as("p100"))
      val exact = facts(120).groupBy("k").agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").as("p50"),
        max($"v").as("p100"))
      assertSameRows(got, exact)
    }
  }

  test("approx_set measure: theta union folds; intersections exact below k") {
    withTempPath { dir =>
      val srcPath = s"$dir/src"; val viewPath = s"$dir/view"
      val src = GraftTable.create(spark, facts(40), srcPath)
      MaterializedView.create(spark, srcPath, viewPath,
        keys = Seq("k"), measures = Seq(Measure("ids", "id", "approx_set")))
      MaterializedView.refresh(spark, viewPath)
      src.append(facts(40)) // identical rows: pure overlap, idempotent union
      src.append(facts(40, offset = 40))
      MaterializedView.refresh(spark, viewPath)
      GraftTable.forPath(spark, viewPath).compaction()
      val sk = MaterializedView.read(spark, viewPath)
        .select($"k", $"ids").collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]]("ids")).toMap
      // per-group distinct ids exact below nominal entries
      sk.foreach { case (k, bytes) =>
        val exact = facts(80).filter($"k" === k).select("id").distinct().count()
        assert(graft.functions.ThetaKernels.estimate(bytes) == exact.toDouble)
      }
      // group sets are disjoint (id % 3 partitions): intersections are 0,
      // the 3-way union is the full id count
      val ks = sk.keys.toSeq.sorted
      assert(graft.functions.ThetaKernels.estimate(
        graft.functions.ThetaKernels.intersect(sk(ks(0)), sk(ks(1)))) == 0.0)
      val all = ks.map(sk).reduce(graft.functions.ThetaKernels.union)
      assert(graft.functions.ThetaKernels.estimate(all) == 80.0)
      // set difference completes the algebra: all \ group0 = the rest
      val rest = graft.functions.ThetaKernels.aNotB(all, sk(ks(0)))
      assert(graft.functions.ThetaKernels.estimate(rest) ==
        80.0 - graft.functions.ThetaKernels.estimate(sk(ks(0))))
    }
  }

  test("star-join view: fact deltas join the dim before aggregation") {
    withTempPath { dir =>
      import MaterializedView.DimJoin
      val dim = (0 until 3).map(i => (s"k$i", s"region${i % 2}"))
        .toDF("k", "region")
      GraftTable.create(spark, dim, s"$dir/dim")
      val src = GraftTable.create(spark, facts(30), s"$dir/src")
      MaterializedView.create(spark, s"$dir/src", s"$dir/view",
        keys = Seq("region"),
        measures = Seq(
          Measure("total", "CAST(v AS DECIMAL(18,2))", "sum"),
          Measure("cnt", "1", "count")),
        dims = Seq(DimJoin(s"$dir/dim", Seq("k"))))
      MaterializedView.refresh(spark, s"$dir/view")
      src.append(facts(30, offset = 30))
      MaterializedView.refresh(spark, s"$dir/view")
      val expected = facts(60).join(dim, Seq("k"), "left")
        .groupBy("region").agg(
          sum($"v".cast("decimal(18,2)")).as("total"),
          count(lit(1)).as("cnt"))
      assertSameRows(MaterializedView.read(spark, s"$dir/view"), expected)
    }
  }

  test("autocompact bounds run counts across refreshes") {
    withTempPath { dir =>
      val srcPath = s"$dir/src"; val viewPath = s"$dir/view"
      val src = GraftTable.create(spark, facts(20), srcPath)
      MaterializedView.create(spark, srcPath, viewPath,
        keys = Seq("k"), measures = Seq(Measure("cnt", "1", "count")),
        properties = Map(MaterializedView.AutoCompactProp -> "3"))
      (0 until 6).foreach { i =>
        if (i > 0) src.append(facts(10, offset = 10 + i * 10))
        MaterializedView.refresh(spark, viewPath)
      }
      val v = GraftTable.forPath(spark, viewPath)
      val runs = v.liveFiles.groupBy(f => (f.partitionDesc, f.file.bucketId))
        .values.map(_.map(_.commitOrdinal).distinct.size).max
      assert(runs < 3, s"autocompact did not bound runs: $runs")
      val expected = facts(70).groupBy("k").agg(count(lit(1)).as("cnt"))
      assertSameRows(MaterializedView.read(spark, viewPath), expected)
    }
  }

  test("min_all/max_all merge ops stand alone on PK tables") {
    withTempPath { dir =>
      val t = GraftTable.create(spark,
        Seq((1L, 5.0, "b"), (2L, 1.0, "x")).toDF("id", "v", "s"), s"$dir/t",
        hashColumns = Seq("id"), bucketNum = 2,
        properties = Map(
          graft.meta.TableInfo.mergeOpProp("v") -> "min_all",
          graft.meta.TableInfo.mergeOpProp("s") -> "max_all"))
      t.upsert(Seq((1L, 7.0, "a"), (2L, 0.5, "z")).toDF("id", "v", "s"))
      t.upsert(Seq((1L, 3.0, "c")).toDF("id", "v", "s"))
      assertRows(t.toDF.select("id", "v", "s"),
        Seq("[1,3.0,c]", "[2,0.5,z]"))
    }
  }
}
