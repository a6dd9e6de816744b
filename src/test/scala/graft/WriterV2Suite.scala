package graft

import org.apache.spark.sql.functions._

/** DataFrameWriterV2 (`df.writeTo(...)`) against the DSv2 catalog —
  * mirrors the reference's DataFrameWriterV2Suite surface: create /
  * createOrReplace / append (by NAME, not position) / overwrite(expr) /
  * overwritePartitions, and the fail-loudly negatives. The reference
  * rejects bucket() transforms through this API; we accept them (the SQL
  * CTAS path already does — one catalog, one rule set). */
class WriterV2Suite extends SparkFixture {
  import spark.implicits._

  private def useCatalog(wh: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft_w2", "graft.catalog.GraftCatalogV2")
    spark.conf.set("spark.graft.warehouse", wh)
  }

  test("create + append by NAME + fail-if-exists / fail-if-missing") {
    withTempPath { wh =>
      useCatalog(wh)
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
        .writeTo("graft_w2.w2.t1").partitionedBy(bucket(2, col("id"))).create()
      assertRows(spark.table("graft_w2.w2.t1"), Seq("[1,a]", "[2,b]"))
      // append matches columns BY NAME (reference :75)
      Seq(("c", 3L)).toDF("v", "id").writeTo("graft_w2.w2.t1").append()
      assertRows(spark.table("graft_w2.w2.t1"),
        Seq("[1,a]", "[2,b]", "[3,c]"))
      intercept[Exception](
        Seq((9L, "x")).toDF("id", "v").writeTo("graft_w2.w2.t1").create())
      intercept[Exception](
        Seq((9L, "x")).toDF("id", "v").writeTo("graft_w2.w2.missing").append())
      spark.sql("DROP TABLE graft_w2.w2.t1")
    }
  }

  test("overwrite by expression replaces matching partitions only") {
    withTempPath { wh =>
      useCatalog(wh)
      Seq((1L, "p1", 10), (2L, "p1", 20), (3L, "p2", 30))
        .toDF("id", "part", "v")
        .writeTo("graft_w2.w2.t2")
        .partitionedBy(col("part"), bucket(2, col("id"))).create()
      Seq((7L, "p1", 70)).toDF("id", "part", "v")
        .writeTo("graft_w2.w2.t2").overwrite(col("part") === "p1")
      assertRows(spark.table("graft_w2.w2.t2").select("id", "v"),
        Seq("[3,30]", "[7,70]"))
      spark.sql("DROP TABLE graft_w2.w2.t2")
    }
  }

  test("overwritePartitions replaces exactly the batch's partitions") {
    withTempPath { wh =>
      useCatalog(wh)
      Seq((1L, "p1", 10), (2L, "p2", 20), (3L, "p3", 30))
        .toDF("id", "part", "v")
        .writeTo("graft_w2.w2.t3")
        .partitionedBy(col("part"), bucket(2, col("id"))).create()
      Seq((8L, "p1", 80), (9L, "p2", 90)).toDF("id", "part", "v")
        .writeTo("graft_w2.w2.t3").overwritePartitions()
      assertRows(spark.table("graft_w2.w2.t3").select("id", "v"),
        Seq("[3,30]", "[8,80]", "[9,90]"))
      spark.sql("DROP TABLE graft_w2.w2.t3")
    }
  }

  test("createOrReplace swaps schema and contents atomically") {
    withTempPath { wh =>
      useCatalog(wh)
      Seq((1L, "a")).toDF("id", "v")
        .writeTo("graft_w2.w2.t4").partitionedBy(bucket(2, col("id"))).create()
      Seq((5L, 50.0)).toDF("id", "score")
        .writeTo("graft_w2.w2.t4").partitionedBy(bucket(2, col("id")))
        .createOrReplace()
      val out = spark.table("graft_w2.w2.t4")
      assert(out.columns.toSeq == Seq("id", "score"), out.columns.toSeq)
      assertRows(out, Seq("[5,50.0]"))
      spark.sql("DROP TABLE graft_w2.w2.t4")
    }
  }
}
