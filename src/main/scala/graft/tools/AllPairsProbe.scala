package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.pipeline.{Dedup, TextAnalysis}

/** Stage-by-stage timing of the AllPairs (prefix-filter) near-dup path —
  * shingling, demotion stats, prefix explode, raw join fan-out, distinct,
  * verification, component resolution — to locate where
  * `dedup_keep_best` / `source_overlap` wall-clock goes.
  *
  * Usage: runMain graft.tools.AllPairsProbe [threshold]
  */
object AllPairsProbe {
  def main(args: Array[String]): Unit = {
    val threshold = if (args.nonEmpty) args(0).toDouble else 0.5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val doc = spark.read.parquet(s"$sfDir/documents.parquet")

    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[appairs] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round (threshold $threshold) ---")
      // stage 1: shingle projection
      val hs0 = doc
        .select(col("doc_id").as("_g_id"), TextAnalysis.tokens(col("text")).as("_g_ts"))
        .select(col("_g_id"),
          transform(array_distinct(TextAnalysis.wordShinglesOf(col("_g_ts"), 3)),
            s => GraftFunctions.xx64(s)).as("_g_hs0"))
        .localCheckpoint(false)
      timed("shingle projection")(hs0.count())
      // stage 2: demotion stats
      val demoted = timed("demotion top-N")(hs0
        .select(explode(col("_g_hs0")).as("_g_tok"))
        .groupBy("_g_tok").agg(count(lit(1)).as("_g_n"))
        .filter(col("_g_n") > 1)
        .orderBy(col("_g_n").desc, col("_g_tok")).limit(4096)
        .collect().map(_.getLong(0)))
      // stage 3: reorder + prefix explode
      val ordered = hs0.select(col("_g_id"),
        GraftFunctions.prefixOrder(col("_g_hs0"),
          typedLit(demoted.toSeq)).as("_g_hs"))
      val sz = size(col("_g_hs"))
      val prefLen = (sz - ceil(sz * lit(threshold)) + 1).cast("int")
      val pref = ordered.select(col("_g_id"), sz.as("_g_sz"),
        posexplode(slice(col("_g_hs"), lit(1), greatest(prefLen, lit(0))))
          .as(Seq("_g_pos", "_g_tok")))
        .localCheckpoint(false)
      val nPref = timed("reorder + prefix explode")(pref.count())
      println(s"[appairs]   prefix rows: $nPref")
      // stage 4: raw join fan-out
      val a = pref.select(col("_g_id").as("id_a"), col("_g_tok"),
        col("_g_sz").as("_g_sza"), col("_g_pos").as("_g_pa"))
      val b = pref.select(col("_g_id").as("id_b"), col("_g_tok"),
        col("_g_sz").as("_g_szb"), col("_g_pos").as("_g_pb"))
      val raw = a.join(b, "_g_tok").filter(col("id_a") < col("id_b"))
      val nRaw = timed("raw join fan-out")(raw.count())
      println(s"[appairs]   raw joined rows: $nRaw")
      val minSz = least(col("_g_sza"), col("_g_szb")).cast("double")
      val maxSz = greatest(col("_g_sza"), col("_g_szb")).cast("double")
      val ubound = least(col("_g_pa"), col("_g_pb")) + lit(1) +
        least(col("_g_sza") - col("_g_pa") - 1, col("_g_szb") - col("_g_pb") - 1)
      val alpha = (lit(threshold / (1 + threshold)) *
        (col("_g_sza") + col("_g_szb")).cast("double")) - lit(1e-9)
      val filtered = raw
        .filter(minSz + lit(1e-9) >= lit(threshold) * maxSz)
        .filter(ubound.cast("double") >= alpha)
      val nFilt = timed("ppjoin filters")(filtered.count())
      println(s"[appairs]   after filters: $nFilt")
      val cands = filtered.select("id_a", "id_b").distinct().localCheckpoint(false)
      val nc = timed("distinct")(cands.count())
      println(s"[appairs]   candidate pairs: $nc")
      // stage 5: verify
      val verified = Dedup.jaccardVerify(cands, doc, "doc_id", "text")
        .filter(col("jaccard") >= threshold).localCheckpoint(false)
      val np = timed("verify")(verified.count())
      println(s"[appairs]   verified pairs: $np")
      // stage 6: components + keeper election
      val kb = Dedup.keepBest(doc.select("doc_id", "n_chars"), "doc_id",
        verified, "n_chars")
      timed("components + keepBest")(kb.count())
    }
    spark.stop()
  }
}
