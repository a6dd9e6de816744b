package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins README's hand-written gate numbers to the code they describe, so a
  * new `SparkEntry.queries` entry that forgets the README edit fails the
  * suite instead of drifting silently (this drifted twice in past rounds).
  * Pure file/Map checks — no SparkSession needed.
  */
class GateCountsSuite extends AnyFunSuite {

  private lazy val readme = {
    val src = scala.io.Source.fromFile("README.md", "UTF-8")
    try src.mkString finally src.close()
  }

  test("README's query count matches SparkEntry.queries.size") {
    val n = SparkEntry.queries.size
    val claims = """(\d+) `SparkEntry\.queries`""".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toSeq
    assert(claims.nonEmpty, "README no longer states the query count")
    assert(claims.forall(_ == n),
      s"README claims $claims queries but SparkEntry.queries has $n — " +
        "update the count in README.md")
    val oracled = """ALL (\d+) oracled""".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toSeq
    assert(oracled.forall(_ == n),
      s"README claims 'ALL ${oracled} oracled' but there are $n queries")
  }

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).toSeq.sorted}")
    assert((q -- o).isEmpty, s"queries without oracles: ${(q -- o).toSeq.sorted}")
  }
}

/** Pins the gate-output contract: the driver's comparator pandas-sorts the
  * RAW result frame and dies on dict/ndarray cells, so every
  * `SparkEntry.queries` projection must be all-scalar. The `q()` wrapper
  * enforces it at query-build time; this suite proves the guard trips
  * (a nested top-level column fails here instead of at the driver).
  */
class GateSchemaSuite extends SparkFixture {
  import org.apache.spark.sql.functions._

  test("requireGateSortable rejects struct/array/map top-level columns") {
    val base = spark.range(3).select(col("id"), struct(col("id").as("a")).as("st"))
    val e = intercept[IllegalArgumentException] {
      SparkEntry.requireGateSortable(base)
    }
    assert(e.getMessage.contains("st: struct<a:bigint>"))
    intercept[IllegalArgumentException] {
      SparkEntry.requireGateSortable(
        spark.range(3).select(array(col("id")).as("arr")))
    }
    intercept[IllegalArgumentException] {
      SparkEntry.requireGateSortable(
        spark.range(3).select(map(lit("k"), col("id")).as("m")))
    }
    // scalars (incl. date/timestamp/decimal/binary) pass through
    val ok = spark.range(3).select(col("id"), col("id").cast("string").as("s"),
      col("id").cast("decimal(10,2)").as("dec"),
      col("id").cast("timestamp").as("ts"))
    assert(SparkEntry.requireGateSortable(ok) eq ok)
  }
}
