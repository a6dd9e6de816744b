package graft

import org.apache.spark.sql.functions._

import graft.read.{BoundedMerge, MergeReaderGauge}
import graft.tables.GraftTable

/** Bounded-memory merge (BoundedMerge): a deep run backlog merges with at
  * most `spark.graft.merge.maxOpenRuns` simultaneously open parquet readers
  * per task — oldest same-signature runs pre-merge into local spill files —
  * with results identical to the unbounded merge across merge operators,
  * tombstones, and revivals. The reference bounds the same hazard with its
  * part-merge (MergeParquetScan.scala:71-114, LakeSoulPartFileMerge.scala). */
class BoundedMergeSuite extends SparkFixture {
  import spark.implicits._

  private def withCap[A](n: Int)(f: => A): A = {
    spark.conf.set(BoundedMerge.ConfKey, n.toString)
    try f finally spark.conf.unset(BoundedMerge.ConfKey)
  }

  test("64-run bucket: <=cap open readers, identical results to unbounded, " +
    "sum/use_last/tombstone semantics exact across the spill boundary") {
    withTempPath { dir =>
      // bucketNum=1 -> ONE merge task, so the process-global gauge peak IS
      // the per-task open-reader count
      val base = (1L to 400L).map(i => (i, s"v$i", 1L)).toDF("k", "v", "n")
      val t = GraftTable.create(spark, base, dir,
        hashColumns = Seq("k"), bucketNum = 1,
        properties = Map("graft.mergeop.n" -> "sum_all"))

      // mirror of the table state: v is use_last, n is sum_all; a tombstone
      // drops the key, a later upsert revives it from scratch
      val exp = scala.collection.mutable.Map[Long, (String, Long)]()
      (1L to 400L).foreach(k => exp(k) = (s"v$k", 1L))
      def applyUp(k: Long, v: String, n: Long): Unit =
        exp(k) = exp.get(k) match {
          case Some((_, o)) => (v, o + n)
          case None => (v, n)
        }

      (1 to 63).foreach { i =>
        val rows = (1L to 5L).map { j =>
          (((i * 7 + j) % 400) + 1, s"u$i-$j", i.toLong)
        } :+ ((400L + i, s"new$i", 0L))
        t.upsert(rows.toDF("k", "v", "n"))
        rows.foreach { case (k, v, n) => applyUp(k, v, n) }
        if (i == 30) { // tombstone mid-history: breaks signature chunks
          t.deleteTombstone($"k" <= 20L)
          (1L to 20L).foreach(exp.remove)
        }
      }

      def collectAll(): Seq[(Long, String, Long)] =
        t.toDF.select("k", "v", "n").as[(Long, String, Long)]
          .collect().sortBy(_._1).toSeq

      MergeReaderGauge.reset()
      val bounded = withCap(6)(collectAll())
      val boundedPeak = MergeReaderGauge.peak
      assert(boundedPeak > 0 && boundedPeak <= 6,
        s"expected <=6 simultaneously open parquet readers, saw $boundedPeak")

      MergeReaderGauge.reset()
      val unbounded = withCap(1000)(collectAll())
      val unboundedPeak = MergeReaderGauge.peak
      assert(unboundedPeak > 6,
        s"unbounded merge should open all runs at once (gauge sanity), " +
          s"saw $unboundedPeak")

      assert(bounded == unbounded,
        s"bounded vs unbounded diverge: " +
          s"missing=${unbounded.diff(bounded).take(5)} " +
          s"extra=${bounded.diff(unbounded).take(5)}")
      val expected = exp.toSeq.map { case (k, (v, n)) => (k, v, n) }.sortBy(_._1)
      assert(bounded == expected,
        s"missing=${expected.diff(bounded).take(5)} " +
          s"extra=${bounded.diff(expected).take(5)}")
    }
  }

  test("DSv2 catalog scan honors the open-run cap") {
    withTempPath { wh =>
      spark.conf.set("spark.sql.catalog.graft_cat", "graft.catalog.GraftCatalogV2")
      spark.conf.set("spark.graft.warehouse", wh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.bm")
      try {
        spark.sql("CREATE TABLE graft_cat.bm.t (id BIGINT, v STRING) " +
          "PARTITIONED BY (bucket(1, id))")
        spark.sql("INSERT INTO graft_cat.bm.t " +
          "SELECT id, concat('v', id) FROM range(1, 101)")
        val t = GraftTable.forName(spark, "bm.t")
        (1 to 20).foreach { i =>
          t.upsert(Seq((i.toLong, s"u$i"), (100L - i, s"w$i")).toDF("id", "v"))
        }
        MergeReaderGauge.reset()
        val rows = withCap(4) {
          spark.sql("SELECT * FROM graft_cat.bm.t ORDER BY id")
            .as[(Long, String)].collect().toSeq
        }
        assert(MergeReaderGauge.peak > 0 && MergeReaderGauge.peak <= 4,
          s"DSv2 merge must respect the cap, saw peak ${MergeReaderGauge.peak}")
        assert(rows.size == 100)
        assert(rows.take(3) == Seq((1L, "u1"), (2L, "u2"), (3L, "u3")))
        assert(rows(98) == (99L, "w1") && rows(99) == (100L, "v100"))
      } finally spark.sql("DROP TABLE IF EXISTS graft_cat.bm.t")
    }
  }
}
