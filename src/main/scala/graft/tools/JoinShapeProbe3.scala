package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17 sweep (VERDICT items 7/8): q13 pre-aggregate-before-join and a
  * manual Bloom pre-filter on q9's fact scan, round-robin interleaved
  * (host drift hits all arms equally). Same rules as JoinShapeProbe:
  * result-equivalent rewrites only, exceptAll equality asserted.
  *
  * Usage: runMain graft.tools.JoinShapeProbe3 [reps]
  */
object JoinShapeProbe3 {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 7
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def rd(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    def dec(c: String) = col(c).cast("decimal(18,2)")

    // q13 exactly as shipped vs orders pre-aggregated before the join
    // (join carries one row per customer instead of one per order)
    def q13(shape: String): DataFrame = shape match {
      case "asis" =>
        val o = rd("orders").filter(col("o_orderpriority") =!= "1-URGENT")
        rd("customer")
          .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      case "preagg" =>
        val oc = rd("orders").filter(col("o_orderpriority") =!= "1-URGENT")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("_n"))
        rd("customer")
          .join(oc, col("c_custkey") === col("o_custkey"), "left_outer")
          .select(coalesce(col("_n"), lit(0L)).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
    }

    // q9 as shipped vs a manual Bloom pre-filter of lineitem on the
    // selective part side's keys (guide §3.2) — at this SF the dims
    // broadcast so there is no fact exchange to protect; this measures
    // whether the row-drop before the joins pays for the filter pass
    lazy val redPartBloom = {
      val keys = rd("part").filter(col("p_name").contains("red"))
        .select(col("p_partkey"))
      val n = keys.count()
      val bf = keys.stat.bloomFilter("p_partkey", math.max(n, 1000L), 0.01)
      spark.sparkContext.broadcast(bf)
    }
    def q9(shape: String): DataFrame = {
      val li0 = rd("lineitem")
      val li = shape match {
        case "asis" => li0
        case "bloom" =>
          val bfB = redPartBloom
          val maybe = udf((id: Long) => bfB.value.mightContainLong(id))
          li0.where(maybe(col("l_partkey")))
      }
      li
        .join(rd("part").filter(col("p_name").contains("red")),
          col("l_partkey") === col("p_partkey"))
        .join(rd("supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(rd("nation"), col("s_nationkey") === col("n_nationkey"))
        .join(rd("orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount")))
          .cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }

    // q18 as shipped (customer joins all orders, bigOrders filter last) vs
    // selective-first (orders x bigOrders, then customer): the same rows
    // stream, but non-qualifying orders stop at the first (tiny) build
    def q18(shape: String): DataFrame = {
      val bigOrders = rd("lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(dec("l_quantity")).cast("double").as("sum_qty"))
        .filter(col("sum_qty") > 150)
      val joined = shape match {
        case "asis" =>
          rd("customer")
            .join(rd("orders"), col("c_custkey") === col("o_custkey"))
            .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
        case "selfirst" =>
          rd("orders")
            .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
            .join(rd("customer"), col("c_custkey") === col("o_custkey"))
      }
      joined
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q13_asis" -> (() => q13("asis")),
      "q13_preagg" -> (() => q13("preagg")),
      "q9_asis" -> (() => q9("asis")),
      "q9_bloom" -> (() => q9("bloom")),
      "q18_asis" -> (() => q18("asis")),
      "q18_selfirst" -> (() => q18("selfirst")))
    variants.foreach { case (_, f) => f().count() }
    val samples = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      variants.foreach { case (name, f) =>
        val t0 = System.nanoTime(); f().count()
        samples(name) = (System.nanoTime() - t0) / 1e9 :: samples(name)
      }
    }
    variants.foreach { case (name, _) =>
      val ts = samples(name)
      println(f"[jsp3] $name%-14s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f")
    }
    def same(a: DataFrame, b: DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    println(s"[jsp3] q13 equal: ${same(q13("asis"), q13("preagg"))}")
    println(s"[jsp3] q9 equal: ${same(q9("asis"), q9("bloom"))}")
    println(s"[jsp3] q18 equal: ${same(q18("asis"), q18("selfirst"))}")
    spark.stop()
  }
}
