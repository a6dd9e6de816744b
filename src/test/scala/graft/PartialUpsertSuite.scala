package graft

import graft.tables.GraftTable

/** Partial-row upserts: a batch missing some value columns must leave
  * those columns' previous values intact on read (the reference's
  * file_exist_cols semantics — an upsertOnJoinKey delta carries only the
  * join key + changed columns, never the whole row). */
class PartialUpsertSuite extends SparkFixture {
  import spark.implicits._

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
