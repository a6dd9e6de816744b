package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-order-of-magnitude scaling probe: synthesizes an sf1-equivalent
  * dataset (10x the sf0.1 fixture tables the heavy entries read —
  * documents 5k→50k docs, orders 150k→1.5M, events 100k→1M rows), runs
  * the HEAVIEST gate entries at both scales, and reports the sf1/sf0.1
  * wall-ratio per entry. A shuffle-bound plan should scale ~linearly in
  * rows (ratio ≲ 12x on 10x data once fixed per-plan codegen/JIT constants
  * — the sf0.1 numbers' dominant term — are amortized); anything
  * super-linear is a scale bug the sf0.1 bench cannot see (the r11 verdict's
  * blind spot: all-pairs blowups and state explosions only bite past the
  * fixture size).
  *
  * Replication keeps the DISTRIBUTION stable instead of stacking exact
  * copies: ids are offset per replica, and document text word-salts each
  * replica (`' ' -> ' r<i>'`), so near-dup structure within a replica is
  * preserved while replicas never cross-match — duplicate DENSITY (the
  * thing candidate-pair counts scale with) matches sf0.1, only the volume
  * grows. Without the salt every doc gains 9 near-copies and the probe
  * measures a 10x-denser dedup problem, not a 10x-bigger one.
  *
  * args: [sfDir] [factor] [entries CSV] (defaults /root/testdata/sf0.1,
  * 10, the five heaviest pipeline entries + the MOR scenario entry).
  * Prints one line per entry and a summary line; results belong in
  * README's bench notes.
  */
object ScaleFactorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val names = args.lift(2).map(_.split(',').toSeq).getOrElse(Seq(
      "dedup_keep_best", "split_leakage_safe", "source_overlap",
      "mview_mutable", "stream_dedup", "mor_upsert"))

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scalefactor-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // heap comes from build.sbt's -Xmx via SPARK_DRIVER_MEM (a
      // spark.driver.memory conf here would be a no-op in an already-forked
      // local JVM). The DEFAULT 8g now survives the full 100x matrix: the
      // dedup pipeline's corpus-sized caches unroll serialized and are
      // released between jobs (r13; previously needed 48g)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bigDir = ProbeTmp.dir("graft-sfprobe-")
    synthesize(spark, sfDir, bigDir, factor)

    def samples3(body: => Unit): Seq[Double] =
      Seq.fill(3) {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }

    // Per entry: steady-state MEDIAN at both scales (the repeated-analysis
    // regime — with the r14 shared near-dup pair memo this excludes the
    // one-time pair materialization, exactly as a production session
    // would) AND the FIRST big-scale sample, which carries that one-time
    // derivation — the data-proportional pipeline cost the median would
    // otherwise hide. Both published so the scaling signal names its
    // regime instead of flattering itself.
    println(f"%nentry | sf0.1 (s) | sf1 (s) | ratio (linear=$factor%d) | sf1 first (s)")
    val ratios = names.flatMap { name =>
      val fn = graft.SparkEntry.queries(name)
      try {
        fn(spark, sfDir).count() // warm the plan (codegen/JIT, not data)
        val small = samples3 { fn(spark, sfDir).count() }.sorted.apply(1)
        val bigSamples = samples3 { fn(spark, bigDir).count() }
        val big = bigSamples.sorted.apply(1)
        val r = big / small
        println(f"$name%-22s | $small%9.2f | $big%7.2f | ${r}%5.1fx | ${bigSamples.head}%7.2f")
        Some(name -> r)
      } catch {
        case e: Throwable =>
          println(s"$name FAILED: ${e.getMessage}"); None
      }
    }
    val worst = ratios.maxByOption(_._2)
    println(f"""{"metric":"sf_ratio_worst","entry":"${worst.map(_._1).getOrElse("-")}","value":${worst.map(_._2).getOrElse(-1.0)}%.2f,"factor":$factor}""")
    spark.stop()
  }

  /** Write factor-x replicas of the fixture tables the probed entries
    * read. Ids offset per replica; document text word-salted per replica
    * (see object scaladoc). */
  private def synthesize(spark: SparkSession, sfDir: String, outDir: String,
      factor: Int): Unit = {
    val reps = explode(lit((0 until factor).toArray)).as("rep")

    def expand(df: DataFrame): DataFrame = df.select(col("*"), reps)

    val docs = expand(spark.read.parquet(s"$sfDir/documents.parquet"))
      .withColumn("doc_id", col("doc_id") + col("rep") * 100000000L)
      .withColumn("text",
        when(col("rep") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit(" "),
            concat(lit(" r"), col("rep")))))
      .drop("rep")
    docs.repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")

    val orders = expand(spark.read.parquet(s"$sfDir/orders.parquet"))
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * 1000000000L)
      .drop("rep")
    orders.repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/orders.parquet")

    val events = expand(spark.read.parquet(s"$sfDir/events.parquet"))
      .withColumn("event_id", col("event_id") + col("rep") * 1000000000L)
      .drop("rep")
    events.repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/events.parquet")
  }
}
