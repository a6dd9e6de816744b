package graft

import org.apache.spark.sql.functions._
import graft.tables.GraftTable

/** Duplicate primary keys WITHIN one batch (reference
  * manual_execute_suites/UpsertWithDuplicateData{BySame,AndFields}.scala):
  * the write-side fold (TransactionalWrite.preMerge) must collapse them
  * with the column's merge operator — last-wins by batch order for the
  * default use_last, operator fold (e.g. sum) otherwise — at create AND
  * at upsert, including partial-column duplicate batches. */
class DuplicateBatchSuite extends SparkFixture {
  import spark.implicits._

  test("create and upsert batches with duplicate keys fold last-wins") {
    withTempPath { path =>
      // three copies of id=1 in the CREATE batch: last one wins
      val t = GraftTable.create(spark,
        Seq((1L, "a0", 10), (1L, "a1", 11), (1L, "a2", 12), (2L, "b", 20))
          .toDF("id", "name", "age"),
        path, hashColumns = Seq("id"), bucketNum = 2)
      assertRows(t.toDF.select("id", "name", "age"),
        Seq("[1,a2,12]", "[2,b,20]"))
      // duplicate keys in a PARTIAL upsert batch: fold, then fall missing
      // columns through to the older run (the reference's stu/grade shape)
      t.upsert(Seq((1L, 100), (1L, 101), (3L, 30)).toDF("id", "age"))
      assertRows(t.toDF.select("id", "name", "age"),
        Seq("[1,a2,101]", "[2,b,20]", "[3,null,30]"))
      t.compaction()
      assertRows(t.toDF.select("id", "name", "age"),
        Seq("[1,a2,101]", "[2,b,20]", "[3,null,30]"))
    }
  }

  test("duplicate keys fold with the column's merge OPERATOR, not last-wins") {
    withTempPath { path =>
      val t = GraftTable.create(spark,
        Seq((1L, 5), (2L, 7)).toDF("id", "n"), path,
        hashColumns = Seq("id"), bucketNum = 1,
        properties = Map("graft.mergeop.n" -> "sum_all"))
      // one batch carrying id=1 twice: contributions sum WITHIN the batch
      t.upsert(Seq((1L, 10), (1L, 20)).toDF("id", "n"))
      assertRows(t.toDF.select("id", "n"), Seq("[1,35]", "[2,7]"))
    }
  }
}
