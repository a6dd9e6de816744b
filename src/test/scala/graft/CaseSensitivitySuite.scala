package graft

import org.apache.spark.sql.functions._

import graft.tables.GraftTable

/** Case-insensitive column resolution under the Spark default
  * `spark.sql.caseSensitive=false` (reference: schema/CaseSensitivitySuite
  * — `rangePartitions=key` must resolve to column `Key`, and a batch
  * naming `VALUE` for schema column `value` must write that column, not
  * evolve a new one). */
class CaseSensitivitySuite extends SparkFixture {
  import spark.implicits._

  test("partition options resolve case-insensitively to canonical names") {
    withTempPath { path =>
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("Key", "grp", "v")
        .write.format("graft")
        .option("rangePartitions", "GRP")
        .option("hashPartitions", "key").option("hashBucketNum", "2")
        .save(path)
      val t = GraftTable.forPath(spark, path)
      // stored under the SCHEMA's canonical names
      assert(t.info.rangeColumns == Seq("grp") && t.info.hashColumns == Seq("Key"))
      assertRows(spark.read.format("graft").load(path).select("Key", "v"),
        Seq("[1,10]", "[2,20]"))
      // partition pruning still works through the canonical name
      assert(t.toDF.filter($"grp" === "b").count() == 1)
    }
  }

  test("a case-variant batch writes the schema column instead of evolving a new one") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        Seq((1L, 10), (2L, 20)).toDF("id", "value"), path,
        hashColumns = Seq("id"), bucketNum = 2)
      // upsert names the columns ID / VALUE: must hit id / value
      t.upsert(Seq((2L, 99), (3L, 30)).toDF("ID", "VALUE"))
      assert(t.schema.fieldNames.toSeq == Seq("id", "value"),
        s"case variant must not evolve new columns: ${t.schema.fieldNames.toSeq}")
      assertRows(t.toDF.select("id", "value"),
        Seq("[1,10]", "[2,99]", "[3,30]"))
    }
  }

  test("unknown partition columns still fail loudly") {
    withTempPath { path =>
      val e = intercept[IllegalArgumentException] {
        GraftTable.create(spark, Seq((1L, 10)).toDF("id", "v"), path,
          rangeColumns = Seq("nope"))
      }
      assert(e.getMessage.contains("not in data"), e.getMessage)
    }
  }

  test("a batch column matching no schema field still evolves the schema") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        Seq((1L, 10)).toDF("id", "v"), path,
        hashColumns = Seq("id"), bucketNum = 2)
      t.upsert(Seq((2L, 20, "x")).toDF("id", "v", "extra"))
      assert(t.schema.fieldNames.toSeq == Seq("id", "v", "extra"))
      assertRows(t.toDF.select("id", "v", "extra"),
        Seq("[1,10,null]", "[2,20,x]"))
    }
  }
}
