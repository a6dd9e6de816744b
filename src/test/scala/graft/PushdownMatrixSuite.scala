package graft

import java.sql.{Date => SqlDate, Timestamp => SqlTs}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThan, IsNotNull}

import graft.tables.GraftTable

/** Per-type pushdown × merge-safety matrix (reference: NativeFilterSuite,
  * lakesoul-spark/src/test/scala/org/apache/spark/sql/lakesoul/NativeFilterSuite.scala
  * — per-data-type filter correctness checked against full-scan results).
  *
  * Every filter shape per data type must return exactly the rows of
  * filtering the full merged snapshot, across the table states where the
  * reader's behavior differs:
  *   - SINGLE-RUN (fresh write): value filters reach the parquet readers
  *     and the zone-map skipper;
  *   - MULTI-RUN MOR (after upserts): merge-safety drops non-key filters
  *     below the merge (a key's older version could pass a value filter its
  *     newest version fails); Spark re-applies every residual above, so the
  *     ANSWER must not move;
  *   - COMPACTED (back to single-run): full pushdown again.
  * A bug in any of the three (over-eager pushdown through the merge,
  * wrong sentinel on nulls, decimal/date/timestamp bound decoding in the
  * zone maps) shows up as a row diff here. */
class PushdownMatrixSuite extends SparkFixture {

  private val nullEvery = 7

  /** 120 rows, every Spark primitive type, every 7th row NULL in all data
    * columns; `id` is the PK, `grp` the range column. */
  private def base: DataFrame = {
    val n = col("id") % nullEvery === 0
    spark.range(1, 121).toDF("id")
      .withColumn("grp", concat(lit("g"), col("id") % 3))
      .withColumn("i", when(n, lit(null)).otherwise(col("id") % 50).cast("int"))
      .withColumn("l", when(n, lit(null)).otherwise(col("id") * 1000L))
      .withColumn("d", when(n, lit(null)).otherwise(col("id") / 4.0))
      .withColumn("dec",
        when(n, lit(null)).otherwise(col("id") * 1.25).cast("decimal(12,2)"))
      .withColumn("s", when(n, lit(null))
        .otherwise(concat(lit("name_"),
          lpad((col("id") % 40).cast("string"), 3, "0"))))
      .withColumn("dt", when(n, lit(null))
        .otherwise(date_add(lit("2026-01-01").cast("date"),
          (col("id") % 90).cast("int"))))
      .withColumn("ts", when(n, lit(null))
        .otherwise(timestamp_millis(lit(1735689600000L) + col("id") * 3600000L)))
      .withColumn("b", when(n, lit(null)).otherwise(col("id") % 2 === 0))
  }

  /** Deltas that CHANGE values filters test on — an upserted key whose old
    * version passes a filter its new version fails (and vice versa) is
    * exactly what unsafe pushdown through the merge would get wrong. */
  private def upsert1(df: DataFrame): DataFrame =
    df.filter(col("id") % 4 === 0)
      .withColumn("i", (col("i") + 500).cast("int"))
      .withColumn("dec", (col("dec") + 100).cast("decimal(12,2)"))
      .withColumn("s", concat(lit("upd_"), coalesce(col("s"), lit("x"))))
      .withColumn("b", !col("b"))

  private def upsert2(df: DataFrame): DataFrame =
    df.filter(col("id") % 6 === 1)
      .withColumn("l", col("l") - 500000L)
      .withColumn("d", col("d") * -1.0)
      .withColumn("dt", date_add(col("dt"), 400))
      .withColumn("ts", col("ts") + expr("INTERVAL 30 DAYS"))

  private def fold(state: DataFrame, batch: DataFrame): DataFrame =
    state.join(batch.select("id"), Seq("id"), "left_anti").unionByName(batch)

  private def matrix: Seq[(String, Column)] = Seq(
    // int
    "i ="          -> (col("i") === 10),
    "i <"          -> (col("i") < 20),
    "i >="         -> (col("i") >= 40),
    "i in"         -> col("i").isin(3, 9, 27, 45, 510),
    "i is null"    -> col("i").isNull,
    "i is not null" -> col("i").isNotNull,
    // long
    "l ="          -> (col("l") === 24000L),
    "l between"    -> (col("l") >= 20000L && col("l") <= 60000L),
    "l <"          -> (col("l") < 0L),
    // double (incl. the negative values upsert2 writes)
    "d >"          -> (col("d") > 20.0),
    "d <="         -> (col("d") <= 5.5),
    "d < 0"        -> (col("d") < 0.0),
    // decimal
    "dec ="        -> (col("dec") === BigDecimal("30.00")),
    "dec <"        -> (col("dec") < BigDecimal("50.00")),
    "dec >"        -> (col("dec") > BigDecimal("120.00")),
    "dec is null"  -> col("dec").isNull,
    // string
    "s ="          -> (col("s") === "name_010"),
    "s startsWith" -> col("s").startsWith("name_01"),
    "s in"         -> col("s").isin("name_003", "name_007", "upd_name_008"),
    "s >"          -> (col("s") > "name_030"),
    "s <=> null"   -> (col("s") <=> lit(null)),
    // date / timestamp
    "dt ="         -> (col("dt") === SqlDate.valueOf("2026-01-11")),
    "dt >="        -> (col("dt") >= SqlDate.valueOf("2026-02-01")),
    "dt <"         -> (col("dt") < SqlDate.valueOf("2026-01-15")),
    "ts <"         -> (col("ts") < SqlTs.valueOf("2025-01-03 00:00:00")),
    "ts >="        -> (col("ts") >= SqlTs.valueOf("2025-01-05 00:00:00")),
    // boolean
    "b = true"     -> (col("b") === true),
    "b = false"    -> (col("b") === false),
    // primary key (bucket pruning) and range column (partition pruning)
    "pk ="         -> (col("id") === 17L),
    "pk in"        -> col("id").isin(5L, 28L, 40L),
    "range ="      -> (col("grp") === "g2"),
    "range + data" -> (col("grp") === "g1" && col("i") < 30),
    "pk + data"    -> (col("id") === 16L && col("i") > 100))

  private def check(actual: DataFrame, expected: DataFrame, tag: String): Unit =
    matrix.foreach { case (name, cond) =>
      val a = actual.filter(cond).collect().map(_.toString).sorted.toSeq
      val e = expected.filter(cond).collect().map(_.toString).sorted.toSeq
      assert(a == e, s"[$tag] filter '$name' diverged from the full-scan " +
        s"answer: got ${a.size} rows, expected ${e.size}\n" +
        s"got:      ${a.take(5).mkString("; ")}\n" +
        s"expected: ${e.take(5).mkString("; ")}")
    }

  test("every per-type filter answers like the merged snapshot across " +
    "single-run, multi-run, and compacted states") {
    withTempPath { path =>
      val t = GraftTable.create(spark, base, path,
        rangeColumns = Seq("grp"), hashColumns = Seq("id"), bucketNum = 4)
      check(t.toDF, base, "single-run")
      val st1 = fold(base, upsert1(base))
      t.upsert(upsert1(base))
      check(t.toDF, st1, "multi-run-1")
      val st2 = fold(st1, upsert2(base))
      t.upsert(upsert2(base))
      check(t.toDF, st2, "multi-run-2")
      t.compaction()
      check(t.toDF, st2, "compacted")
    }
  }

  test("DSv1 format reads answer the same matrix on a multi-run table") {
    withTempPath { path =>
      base.write.format("graft")
        .option("rangePartitions", "grp")
        .option("hashPartitions", "id").option("hashBucketNum", "4")
        .save(path)
      val t = GraftTable.forPath(spark, path)
      t.upsert(upsert1(base))
      val st1 = fold(base, upsert1(base))
      check(spark.read.format("graft").load(path), st1, "dsv1-multi-run")
    }
  }

  test("pushFilters advertises key filters only on a PK table and " +
    "keeps every filter as residual") {
    withTempPath { path =>
      val t = GraftTable.create(spark, base, path,
        rangeColumns = Seq("grp"), hashColumns = Seq("id"), bucketNum = 4)
      val b = new graft.read.GraftScanBuilder(spark, t)
      val fs: Array[org.apache.spark.sql.sources.Filter] = Array(
        EqualTo("grp", "g1"), EqualTo("id", 17L),
        GreaterThan("i", 10), IsNotNull("s"))
      val residual = b.pushFilters(fs)
      // everything stays residual — Spark re-applies above the scan, which
      // is what makes the merge-safety drop sound
      assert(residual.toSet == fs.toSet)
      // advertised pushdown must not overstate: key columns only (non-key
      // filters are dropped below the merge on multi-run partitions)
      val adv = b.pushedFilters().toSet
      assert(adv.contains(EqualTo("grp", "g1")) && adv.contains(EqualTo("id", 17L)),
        s"key filters should be advertised, got $adv")
      assert(!adv.exists(_.references.exists(c => c == "i" || c == "s")),
        s"non-key filters must not be advertised on a PK table, got $adv")
    }
  }
}
