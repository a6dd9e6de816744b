package graft

import org.apache.spark.sql.functions._

import graft.meta.TableInfo
import graft.tables.GraftTable

/** UPDATE as an upsert delta run (companion to tombstone deletes): matched
  * rows re-written as a delta, zero data files rewritten; exact only for
  * use_last-family merge operators. */
class DeltaUpdateSuite extends SparkFixture {
  import spark.implicits._

  private def mkTable(dir: String): GraftTable = {
    val df = (1L to 100L).map(i => (i, s"v$i", i * 10)).toDF("k", "v", "n")
    GraftTable.create(spark, df, dir, hashColumns = Seq("k"), bucketNum = 4)
  }

  test("delta update rewrites no data files and matches the rewrite semantics") {
    withTempPath { dir =>
      val t = mkTable(dir)
      val before = t.liveFiles.map(_.file.path).toSet
      t.updateDelta($"n" >= 500, Map("v" -> lit("big")))
      assert(before.subsetOf(t.liveFiles.map(_.file.path).toSet),
        "delta update must not rewrite data files")
      val got = t.toDF.select("k", "v").as[(Long, String)].collect().toMap
      (1L to 100L).foreach { k =>
        assert(got(k) == (if (k * 10 >= 500) "big" else s"v$k"), s"k=$k")
      }
    }
  }

  test("SET expressions may read current values") {
    withTempPath { dir =>
      val t = mkTable(dir)
      t.updateDelta($"k" <= 10L, Map("n" -> (col("n") + 1)))
      val got = t.toDF.filter($"k" <= 10L).select("k", "n")
        .as[(Long, Long)].collect().toMap
      (1L to 10L).foreach(k => assert(got(k) == k * 10 + 1))
      assert(t.toDF.count() == 100)
    }
  }

  test("update(cond, set) routes through the delta path under the property") {
    withTempPath { dir =>
      val t = mkTable(dir)
      t.setProperties(Map(TableInfo.UpdateModeProp -> "delta"))
      val before = t.liveFiles.map(_.file.path).toSet
      t.update($"k" === 42L, Map("v" -> lit("answer")))
      assert(before.subsetOf(t.liveFiles.map(_.file.path).toSet))
      assert(t.toDF.filter($"k" === 42L).select("v").as[String].head == "answer")
    }
  }

  test("delta update is a consumable incremental batch (streams see the rows)") {
    withTempPath { dir =>
      val t = mkTable(dir)
      val t0 = t.history.map(_._2).max
      Thread.sleep(5)
      t.updateDelta($"k" === 3L, Map("v" -> lit("streamed")))
      Thread.sleep(5)
      val inc = t.incremental(t0 + 1, System.currentTimeMillis())
        .select("k", "v").as[(Long, String)].collect().toSeq
      assert(inc == Seq((3L, "streamed")), s"got $inc")
    }
  }

  test("non-use_last merge operators are rejected") {
    withTempPath { dir =>
      val t = GraftTable.create(spark, Seq((1L, 5)).toDF("k", "c"), dir,
        hashColumns = Seq("k"), bucketNum = 2,
        properties = Map(TableInfo.mergeOpProp("c") -> "sum_all"))
      val e = intercept[IllegalArgumentException](
        t.updateDelta($"k" === 1L, Map("c" -> lit(9))))
      assert(e.getMessage.contains("use_last"))
      // and the property-routed path silently stays on the rewrite tier
      t.setProperties(Map(TableInfo.UpdateModeProp -> "delta"))
      t.update($"k" === 1L, Map("c" -> lit(9)))
      assert(t.toDF.select("c").as[Int].head == 9)
    }
  }

  test("CDC tables: marker-based DELETE and UPDATE are pure deltas") {
    withTempPath { dir =>
      val df = (1L to 60L).map(i => (i, s"v$i", "insert")).toDF("k", "v", "op")
      val t = GraftTable.create(spark, df, dir, hashColumns = Seq("k"),
        bucketNum = 2,
        properties = Map(
          TableInfo.CdcColumnProp -> "op",
          TableInfo.DeleteModeProp -> "tombstone",
          TableInfo.UpdateModeProp -> "delta"))
      val before = t.liveFiles.map(_.file.path).toSet
      t.delete($"k" % 5 === 0)
      t.update($"k" % 7 === 0, Map("v" -> lit("upd")))
      assert(before.subsetOf(t.liveFiles.map(_.file.path).toSet),
        "CDC marker DML must not rewrite data files")
      def visible(): Map[Long, String] =
        t.toDF.select("k", "v").as[(Long, String)].collect().toMap
      val got = visible()
      (1L to 60L).foreach { k =>
        if (k % 5 == 0) assert(!got.contains(k), s"k=$k must be deleted")
        else if (k % 7 == 0) assert(got(k) == "upd", s"k=$k must be updated")
        else assert(got(k) == s"v$k")
      }
      // streams consume the markers as proper CDC rows
      val inc = t.incremental(t.history.map(_._2).min + 1,
        System.currentTimeMillis())
      val ops = inc.groupBy("op").count().as[(String, Long)].collect().toMap
      // 8 multiples of 7 in 1..60, but 35 was already deleted -> 7 updates
      assert(ops("delete") == 12 && ops("update") == 7, s"got $ops")
      // full compaction materializes: deletes gone, updates become inserts
      t.compaction()
      assert(visible() == got)
      assert(t.toDF(_ => true).count() == 48) // 60 - 12 deleted
    }
  }

  test("SQL UPDATE through the catalog uses the delta path under the property") {
    withTempPath { dir =>
      spark.conf.set("spark.sql.catalog.graft_cat", "graft.catalog.GraftCatalogV2")
      if (spark.conf.getOption("spark.graft.warehouse").isEmpty)
        spark.conf.set("spark.graft.warehouse", dir + "/wh")
      val t = mkTable(dir + "/t")
      t.setProperties(Map(TableInfo.UpdateModeProp -> "delta"))
      graft.catalog.GraftCatalog.register(spark, "du.t1", dir + "/t")
      val before = t.liveFiles.map(_.file.path).toSet
      spark.sql("UPDATE graft_cat.du.t1 SET v = 'sqlset' WHERE k = 7")
      assert(before.subsetOf(t.liveFiles.map(_.file.path).toSet),
        "SQL UPDATE must ride the delta path under the property")
      assert(t.toDF.filter($"k" === 7L).select("v").as[String].head == "sqlset")
    }
  }
}
