package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the persisted near-dup index's batch-proportional check cost:
  * at scale a new-batch near-dup check must NOT re-signature the corpus.
  * Indexes the sf0.01 documents corpus once, then times (a) `check` for
  * several batch sizes against the persisted index vs (b) the
  * re-sign-everything alternative (minhashCandidates over corpus+batch
  * union, the shape a non-indexed pipeline runs per batch).
  *
  * args: [sfDir] (default /root/testdata/sf0.01)
  */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-neardup-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](what: String)(body: => A): A = {
      val s = System.nanoTime(); val r = body
      println(f"$what: ${(System.nanoTime() - s) / 1e6}%.1f ms"); r
    }
    def median3(what: String)(body: => Unit): Unit = {
      val ts = Seq.fill(3) {
        val s = System.nanoTime(); body; (System.nanoTime() - s) / 1e6
      }.sorted
      println(f"$what: median ${ts(1)}%.1f ms (${ts.map(t => f"$t%.0f").mkString("/")})")
    }

    val doc = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    val n = doc.count()
    val dir = java.nio.file.Files.createTempDirectory("graft-ndp-").toString
    val idx = graft.pipeline.NearDupIndex.create(spark, s"$dir/idx")
    time(s"index build ($n docs, sign + banded upsert)") {
      idx.add(doc, "doc_id", "text")
    }

    Seq(16, 64, 256).foreach { bs =>
      val batch = doc.orderBy("doc_id").limit(bs)
        .withColumn("doc_id", col("doc_id") + 1000000).cache()
      batch.count()
      // warm both paths once (plan codegen), then median-of-3
      idx.check(batch, "doc_id", "text", doc).count()
      median3(s"indexed check, batch=$bs") {
        idx.check(batch, "doc_id", "text", doc).count()
      }
      val union = doc.unionByName(batch)
      graft.pipeline.Dedup.minhashNearDupPairs(
        union, "doc_id", "text", threshold = 0.8).count()
      median3(s"re-sign corpus+batch, batch=$bs") {
        graft.pipeline.Dedup.minhashNearDupPairs(
          union, "doc_id", "text", threshold = 0.8).count()
      }
      batch.unpersist()
    }

    // corpus-size scaling at a FIXED batch: the indexed check should stay
    // ~flat (batch signing + key-pruned index read + bounded verify) while
    // the re-sign alternative grows with the corpus
    println("-- corpus scaling, batch=64 --")
    Seq(4, 16).foreach { rep =>
      val big = (0 until rep).map(r =>
        doc.withColumn("doc_id", col("doc_id") + lit(r * 10000000L)))
        .reduce(_ unionByName _)
        // make replicas textually distinct so the candidate set doesn't
        // explode rep^2-fold (each replica gets a distinct token prefix)
        .withColumn("text", concat(lit("r"), (col("doc_id") / 10000000L).cast("long"),
          lit(" uniq "), col("text"))).cache()
      val bn = big.count()
      val idxDir = java.nio.file.Files.createTempDirectory("graft-ndp-big-").toString
      val bigIdx = graft.pipeline.NearDupIndex.create(spark, s"$idxDir/idx")
      time(s"index build ($bn docs)") { bigIdx.add(big, "doc_id", "text") }
      val batch = big.orderBy("doc_id").limit(64)
        .withColumn("doc_id", col("doc_id") + 900000000L).cache()
      batch.count()
      bigIdx.check(batch, "doc_id", "text", big).count()
      median3(s"indexed check, corpus=$bn") {
        bigIdx.check(batch, "doc_id", "text", big).count()
      }
      val union = big.unionByName(batch)
      graft.pipeline.Dedup.minhashNearDupPairs(
        union, "doc_id", "text", threshold = 0.8).count()
      median3(s"re-sign corpus+batch, corpus=$bn") {
        graft.pipeline.Dedup.minhashNearDupPairs(
          union, "doc_id", "text", threshold = 0.8).count()
      }
      big.unpersist(); batch.unpersist()
    }
    spark.stop()
  }
}
