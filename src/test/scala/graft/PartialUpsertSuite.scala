package graft

import graft.tables.GraftTable

/** Partial-row upserts: a batch missing some value columns must leave
  * those columns' previous values intact on read (the reference's
  * file_exist_cols semantics — an upsertOnJoinKey delta carries only the
  * join key + changed columns, never the whole row). */
class PartialUpsertSuite extends SparkFixture {
  import spark.implicits._

  test("a partial batch may omit NON-NULLABLE columns of a range-partitioned table") {
    withTempPath { path =>
      // `w` is int NOT NULL (Scala tuple nullability): the delta file omits
      // it, and the parquet reader must null-fill (nullable-relaxed decode
      // in StreamShim.parquetReadFunction) so the merge falls the value
      // through to the base run — decode-refusal here was a real r12 bug
      val t = GraftTable.create(spark,
        Seq((1, "p1", 10, 5), (2, "p1", 20, 6)).toDF("id", "part", "v", "w"),
        path, rangeColumns = Seq("part"), hashColumns = Seq("id"), bucketNum = 1)
      t.upsert(Seq((1, "p1", 11)).toDF("id", "part", "v"))
      assertRows(t.toDF.select("id", "v", "w"), Seq("[1,11,5]", "[2,20,6]"))
      t.compaction()
      assertRows(t.toDF.select("id", "v", "w"), Seq("[1,11,5]", "[2,20,6]"))
    }
  }

  test("columns absent from an upsert batch fall through to older runs") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "v", "amount"), path,
        hashColumns = Seq("id"), bucketNum = 1)
      // partial batch: no `v` column
      t.upsert(Seq((2L, 99)).toDF("id", "amount"))
      assertRows(t.toDF.select("id", "v", "amount"),
        Seq("[1,a,10]", "[2,b,99]"))
      // and after compaction the fold is identical
      t.compaction()
      assertRows(t.toDF.select("id", "v", "amount"),
        Seq("[1,a,10]", "[2,b,99]"))
    }
  }
}
