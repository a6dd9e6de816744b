package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 experiment: TPC-H q3/q5 join-shape alternatives, timed head-to-head.
  *
  * The shipped shapes let Catalyst pick build sides from parquet size
  * estimates, which at sf0.1 broadcasts the FACT side (q3: 600k-row
  * lineitem; q5: orders AND lineitem) while the small dimension chain
  * streams — an inverted build. Variants reorder the (inner, associative)
  * joins so the fact table streams and only bounded sides broadcast; row
  * counts must match exactly (same query, different physical shape).
  *
  * Usage: runMain graft.tools.JoinShapeProbe [reps]
  */
object JoinShapeProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
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

    def q3Asis(): DataFrame = {
      val c = rd("customer").filter(col("c_mktsegment") === "BUILDING")
      c.join(rd("orders"), col("c_custkey") === col("o_custkey"))
        .join(rd("lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }
    // fact streams: lineitem LEFT, the filtered c⋈o side broadcast
    def q3FactStream(): DataFrame = {
      val c = rd("customer").filter(col("c_mktsegment") === "BUILDING")
      val co = rd("orders").join(broadcast(c), col("c_custkey") === col("o_custkey"))
      rd("lineitem").join(broadcast(co), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }
    def q5Asis(): DataFrame = {
      val reg = rd("region"); val n = rd("nation")
      val cst = rd("customer"); val o = rd("orders")
      val l = rd("lineitem"); val sup = rd("supplier")
      reg.join(n, col("r_regionkey") === col("n_regionkey"))
        .join(cst, col("n_nationkey") === col("c_nationkey"))
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("double").as("revenue"))
        .orderBy("n_name")
    }
    // fact streams: lineitem joins broadcast(orders-side dims) and
    // broadcast(supplier); customer chain pre-joined (all dims)
    def q5FactStream(): DataFrame = {
      val reg = rd("region"); val n = rd("nation")
      val cst = rd("customer"); val o = rd("orders")
      val l = rd("lineitem"); val sup = rd("supplier")
      val dims = reg.join(n, col("r_regionkey") === col("n_regionkey"))
        .join(cst, col("n_nationkey") === col("c_nationkey"))
      val od = o.join(broadcast(dims), col("c_custkey") === col("o_custkey"))
      l.join(broadcast(od), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("double").as("revenue"))
        .orderBy("n_name")
    }

    // hint-free fact-left: join order fixed, strategy left to Catalyst/AQE
    def q3FactLeft(): DataFrame = {
      val c = rd("customer").filter(col("c_mktsegment") === "BUILDING")
      val co = rd("orders").join(c, col("c_custkey") === col("o_custkey"))
      rd("lineitem").join(co, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }
    def q5FactLeft(): DataFrame = {
      val dims = rd("region").join(rd("nation"), col("r_regionkey") === col("n_regionkey"))
        .join(rd("customer"), col("n_nationkey") === col("c_nationkey"))
      val od = rd("orders").join(dims, col("c_custkey") === col("o_custkey"))
      rd("lineitem").join(od, col("o_orderkey") === col("l_orderkey"))
        .join(rd("supplier"), col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("double").as("revenue"))
        .orderBy("n_name")
    }

    // scale-safe strategy hint: SHUFFLE_HASH on the selective side —
    // shuffles both sides (valid at any scale) but builds the small side
    // per partition instead of sorting both
    def q3Shj(): DataFrame = {
      val c = rd("customer").filter(col("c_mktsegment") === "BUILDING")
      val co = rd("orders").join(c.hint("shuffle_hash"),
        col("c_custkey") === col("o_custkey"))
      rd("lineitem").join(co.hint("shuffle_hash"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }
    def q5Shj(): DataFrame = {
      val dims = rd("region").join(rd("nation"), col("r_regionkey") === col("n_regionkey"))
        .join(rd("customer"), col("n_nationkey") === col("c_nationkey"))
      val od = rd("orders").join(dims.hint("shuffle_hash"),
        col("c_custkey") === col("o_custkey"))
      rd("lineitem").join(od.hint("shuffle_hash"), col("o_orderkey") === col("l_orderkey"))
        .join(rd("supplier").hint("shuffle_hash"),
          col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("double").as("revenue"))
        .orderBy("n_name")
    }

    // hint ONLY the fact-side join: small dims keep auto-broadcast (local)
    // and degrade to SMJ at scale; the l-side join gets SHJ with the
    // selective side as per-partition build
    def q3Shj2(): DataFrame = {
      val c = rd("customer").filter(col("c_mktsegment") === "BUILDING")
      val co = rd("orders").join(c, col("c_custkey") === col("o_custkey"))
      rd("lineitem").join(co.hint("shuffle_hash"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }
    def q5Shj2(): DataFrame = {
      val dims = rd("region").join(rd("nation"), col("r_regionkey") === col("n_regionkey"))
        .join(rd("customer"), col("n_nationkey") === col("c_nationkey"))
      val od = rd("orders").join(dims, col("c_custkey") === col("o_custkey"))
      rd("lineitem").join(od.hint("shuffle_hash"), col("o_orderkey") === col("l_orderkey"))
        .join(rd("supplier"), col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("double").as("revenue"))
        .orderBy("n_name")
    }

    // q21: groupBy (l_orderkey, l_suppkey) then window by l_orderkey = two
    // exchanges keyed compatibly — establish HashPartitioning(l_orderkey)
    // once and both reuse it (guide §2.4)
    def q21(shared: Boolean): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val joined = rd("lineitem")
        .join(rd("orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
      val pre = if (shared) joined.repartition(col("l_orderkey")) else joined
      val ls = pre.groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1).otherwise(0)).as("late"))
      val w = Window.partitionBy(col("l_orderkey"))
      ls.withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("n_late", sum(col("late")).over(w))
        .filter(col("late") === 1 && col("n_supp") > 1 && col("n_late") === 1)
        .join(rd("supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(rd("nation").filter(col("n_name") === "NATION_1"),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q3_asis" -> (() => q3Asis()),
      "q3_factstream" -> (() => q3FactStream()),
      "q3_shj" -> (() => q3Shj()),
      "q3_shj2" -> (() => q3Shj2()),
      "q5_asis" -> (() => q5Asis()),
      "q5_factstream" -> (() => q5FactStream()),
      "q5_shj" -> (() => q5Shj()),
      "q5_shj2" -> (() => q5Shj2()),
      "q21_asis" -> (() => q21(false)),
      "q21_shared" -> (() => q21(true)))
    variants.foreach { case (_, f) => f().count() } // warm all (codegen + JIT)
    // ROUND-ROBIN interleaving: host speed drifts minute-to-minute, so
    // consecutive per-variant loops bias whichever ran in a slow window
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
      println(f"[jsp] $name%-16s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f")
    }
    // result equivalence: full-frame symmetric diff must be empty
    def same(a: DataFrame, b: DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    println(s"[jsp] q3 equal: ${same(q3Asis(), q3FactStream())}")
    println(s"[jsp] q5 equal: ${same(q5Asis(), q5FactStream())}")
    println(s"[jsp] q3 shj2 equal: ${same(q3Asis(), q3Shj2())}")
    println(s"[jsp] q5 shj2 equal: ${same(q5Asis(), q5Shj2())}")
    println(s"[jsp] q21 shared equal: ${same(q21(false), q21(true))}")
    spark.stop()
  }
}
