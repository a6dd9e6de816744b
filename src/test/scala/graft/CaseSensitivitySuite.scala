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

  test("DSv1 partitionBy sets the range spec; rangePartitions wins when both given") {
    // reference schema/CaseSensitivitySuite.scala:69-111: partitionBy ==
    // rangePartitions, explicit option has priority
    withTempPath { path =>
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("Key", "grp", "v")
        .write.format("graft").partitionBy("GRP")
        .option("hashPartitions", "key").option("hashBucketNum", "2")
        .save(path)
      val t = GraftTable.forPath(spark, path)
      assert(t.info.rangeColumns == Seq("grp"), t.info.rangeColumns)
    }
    withTempPath { path =>
      Seq((1L, "a", "x", 10)).toDF("Key", "grp", "other", "v")
        .write.format("graft")
        .option("rangePartitions", "grp").partitionBy("other")
        .option("hashPartitions", "key").option("hashBucketNum", "2")
        .save(path)
      assert(GraftTable.forPath(spark, path).info.rangeColumns == Seq("grp"))
    }
  }

  test("case-variant partitionBy against an EXISTING table, both session modes") {
    for (cs <- Seq("true", "false")) withTempPath { path =>
      val prev = spark.conf.get("spark.sql.caseSensitive")
      spark.conf.set("spark.sql.caseSensitive", cs)
      try {
        Seq((1L, "a", 10)).toDF("id", "grp", "v").write.format("graft")
          .option("rangePartitions", "grp")
          .option("hashPartitions", "id").option("hashBucketNum", "2")
          .save(path)
        // a case-variant partitionBy OPTION must resolve to the existing
        // range spec (partition-OPTION resolution is session-mode-
        // independent, like the reference's) — not fail, not fork a second
        // layout. Batch COLUMN resolution stays mode-dependent (C18), so
        // the data columns here match the schema exactly.
        Seq((2L, "b", 20)).toDF("id", "grp", "v").write.format("graft")
          .mode("append").partitionBy("GRP").save(path)
        val t = GraftTable.forPath(spark, path)
        assert(t.info.rangeColumns == Seq("grp"))
        assert(t.schema.fieldNames.toSeq == Seq("id", "grp", "v"),
          s"mode=$cs: ${t.schema.fieldNames.toSeq}")
        assert(t.toDF.filter(col("grp") === "b").count() == 1)
        // a partitionBy naming a DIFFERENT layout fails loudly
        val e = intercept[IllegalArgumentException] {
          Seq((3L, "c", 30)).toDF("id", "grp", "v").write.format("graft")
            .mode("append").partitionBy("v").save(path)
        }
        assert(e.getMessage.contains("does not match"), e.getMessage)
      } finally spark.conf.set("spark.sql.caseSensitive", prev)
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
