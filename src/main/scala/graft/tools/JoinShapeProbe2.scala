package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 second sweep: q9/q10/q13 build-side variants, round-robin
  * interleaved (host drift hits all arms equally). Same rules as
  * JoinShapeProbe: inner-join reorder + strategy hints only, exceptAll
  * equality asserted.
  *
  * Usage: runMain graft.tools.JoinShapeProbe2 [reps]
  */
object JoinShapeProbe2 {
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

    // q10 exactly as shipped (SparkEntry q10_returned_items) vs fact-left
    // with SHUFFLE_HASH on the selective c⋈o(date-window) side
    def q10(shape: String): DataFrame = {
      val joined = shape match {
        case "asis" =>
          rd("customer")
            .join(rd("orders"), col("c_custkey") === col("o_custkey"))
            .join(rd("lineitem").filter(col("l_returnflag") === "R"),
              col("l_orderkey") === col("o_orderkey"))
            .join(rd("nation"), col("c_nationkey") === col("n_nationkey"))
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        case "factleft_shj" =>
          val co = rd("orders")
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
            .join(rd("customer"), col("c_custkey") === col("o_custkey"))
          rd("lineitem").filter(col("l_returnflag") === "R")
            .join(co.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
            .join(rd("nation"), col("c_nationkey") === col("n_nationkey"))
      }
      joined
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q10_asis" -> (() => q10("asis")),
      "q10_factleft_shj" -> (() => q10("factleft_shj")))
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
      println(f"[jsp2] $name%-18s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f")
    }
    def same(a: DataFrame, b: DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    println(s"[jsp2] q10 equal: ${same(q10("asis"), q10("factleft_shj"))}")
    spark.stop()
  }
}
