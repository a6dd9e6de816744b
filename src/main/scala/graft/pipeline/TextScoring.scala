package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistics term scoring for retrieval / data-curation pipelines:
  * per-(doc, term) TF-IDF and Okapi BM25 over the whitespace tokenizer of
  * [[TextAnalysis.tokens]].
  *
  * Plan shape (the one you'd run at 100 TB): one explode projection, a
  * (doc, term) partial-agg shuffle, a term-level document-frequency agg that
  * reuses the term partitioning, one scalar driver agg (corpus size + mean
  * doc length), and a final equi-join of tf × df — no UDFs, no collect of
  * row data.
  *
  * Formulas (smoothed, deterministic):
  *   idf   = ln((N + 1) / (df + 1)) + 1
  *   tfidf = tf * idf
  *   bm25  = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
  */
object TextScoring {

  def termScores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val n = docs.count()
    val tf = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col(idCol)).agg(sum("tf").as("_g_dl"))
    val avgdl = dl.agg(avg(col("_g_dl"))).head.getDouble(0)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log((lit(n.toDouble) + 1.0) / (col("df") + 1.0)) + 1.0
    tf.join(dfreq, "term").join(dl, idCol)
      .withColumn("tfidf", round(col("tf") * idf, 4))
      .withColumn("bm25", round(idf * col("tf") * lit(k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("_g_dl") / lit(avgdl))), 4))
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("tfidf"), col("bm25"))
  }
}
