package graft

import org.apache.spark.sql.functions._
import graft.tables.GraftTable

class BucketedJoinSuite extends SparkFixture {
  import spark.implicits._

  test("bucketedJoin matches a regular join and plans zero exchanges") {
    withTempPath { p1 =>
      withTempPath { p2 =>
        val l = (1 to 200).map(i => (i.toLong, s"l$i")).toDF("id", "lv")
        val r = (101 to 300).map(i => (i.toLong, i * 2)).toDF("id", "rv")
        val t1 = GraftTable.create(spark, l, p1, hashColumns = Seq("id"), bucketNum = 4)
        val t2 = GraftTable.create(spark, r, p2, hashColumns = Seq("id"), bucketNum = 4)
        // deltas on both sides so the merge path is exercised
        t1.upsert(Seq((150L, "L150")).toDF("id", "lv"))
        t2.upsert(Seq((150L, 999)).toDF("id", "rv"))

        val joined = t1.bucketedJoin(t2)
        val expected = t1.toDF.join(t2.toDF, "id")
        assertSameRows(joined, expected)
        assert(joined.filter($"id" === 150L).head.getString(1) == "L150")
        assert(joined.filter($"id" === 150L).head.getInt(2) == 999)
        // the whole point: no shuffle in the physical plan
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
      }
    }
  }

  test("bucketedJoin on CDC tables elides delete tombstones") {
    withTempPath { p1 =>
      withTempPath { p2 =>
        import graft.meta.TableInfo
        val l = (1 to 100).map(i => (i.toLong, s"l$i", "insert"))
          .toDF("id", "lv", "op")
        val t1 = GraftTable.create(spark, l, p1, hashColumns = Seq("id"),
          bucketNum = 4, properties = Map(TableInfo.CdcColumnProp -> "op"))
        val t2 = GraftTable.create(spark,
          (1 to 100).map(i => (i.toLong, i * 10)).toDF("id", "rv"), p2,
          hashColumns = Seq("id"), bucketNum = 4)
        // delete every 10th id on the CDC side
        t1.upsert(l.filter($"id" % 10 === 0).withColumn("op", lit("delete")))
        val joined = t1.bucketedJoin(t2)
        assert(joined.count() == 90)
        assert(joined.filter($"id" % 10 === 0).count() == 0)
        assertSameRows(joined, t1.toDF.join(t2.toDF, "id"))
      }
    }
  }

  test("bucketedJoin on range-partitioned tables (hash fallback) is correct") {
    withTempPath { p1 =>
      withTempPath { p2 =>
        val l = (1 to 200).map(i => (i.toLong, if (i % 2 == 0) "e" else "o", s"l$i"))
          .toDF("id", "par", "lv")
        val r = (51 to 250).map(i => (i.toLong, i * 3)).toDF("id", "rv")
        val t1 = GraftTable.create(spark, l, p1, rangeColumns = Seq("par"),
          hashColumns = Seq("id"), bucketNum = 4)
        val t2 = GraftTable.create(spark, r, p2, hashColumns = Seq("id"), bucketNum = 4)
        t1.upsert(Seq((60L, "e", "L60")).toDF("id", "par", "lv"))
        val joined = t1.bucketedJoin(t2)
        assertSameRows(joined, t1.toDF.join(t2.toDF, "id"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
      }
    }
  }

  test("bucketedJoin validates bucketing compatibility") {
    withTempPath { p1 =>
      withTempPath { p2 =>
        val t1 = GraftTable.create(spark, Seq((1L, "a")).toDF("id", "v"), p1,
          hashColumns = Seq("id"), bucketNum = 4)
        val t2 = GraftTable.create(spark, Seq((1L, "b")).toDF("id", "w"), p2,
          hashColumns = Seq("id"), bucketNum = 8)
        val e = intercept[IllegalArgumentException](t1.bucketedJoin(t2))
        assert(e.getMessage.contains("bucket counts differ"))
      }
    }
  }
}
