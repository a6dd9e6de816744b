package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tables.{CompactionOptions, GraftTable}

/** Leveled compaction must not reorder runs: merging small runs AROUND a
  * carried-over large run and publishing the result as the newest run would
  * let an old value beat a newer one. */
class LeveledOrderSuite extends AnyFunSuite with SparkFixture {

  test("partial compaction never resurrects an older value across a carried run") {
    withTempPath { dir =>
    import spark.implicits._
    // r0: small run, k=1 -> "v0"
    val t = GraftTable.create(spark,
      Seq((1L, "v0")).toDF("k", "v"), dir, hashColumns = Seq("k"), bucketNum = 2)
    // r1: LARGE run (files well over the size limit), k=1 -> "v1"
    t.upsert((1L to 200000L).map(i => (i, "v1" + ("x" * 20))).toDF("k", "v"))
    // r2: small run, other keys only (does not touch k=1)
    t.upsert(Seq((300001L, "v2")).toDF("k", "v"))
    val sizeLimit = 50L * 1024 // r1's files are bigger than this; r0/r2 smaller
    val large = t.liveFiles.filter(_.commitOrdinal == 1).map(_.file.size)
    assert(large.forall(_ >= sizeLimit), s"setup: r1 files must be large: $large")
    t.compaction(CompactionOptions(fileSizeLimit = Some(sizeLimit)), _ => true)
    // r1 must be carried over untouched; only the r2 suffix merged. r0 is
    // stranded under the carried run and waits for full compaction.
    val after = t.liveFiles.map(_.file.size)
    assert(after.count(_ >= sizeLimit) == large.size, s"carried runs: $after")
    val got = t.toDF.filter($"k" === 1L).select("v").as[String].collect().toSeq
    assert(got == Seq("v1" + ("x" * 20)),
      s"k=1 must keep r1's value after leveled compaction, got $got")
    }
  }
}
