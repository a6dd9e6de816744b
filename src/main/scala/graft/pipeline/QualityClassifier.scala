package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seed-trained document quality classifier — the fastText-style "looks
  * like the reference corpus" filter of LLM data pipelines (GPT-3's
  * WebText-vs-crawl classifier, CCNet, LLaMA's wiki-reference filter):
  * train a multinomial Naive Bayes model over word tokens on a LABELED
  * seed corpus (positive = trusted/curated text, negative = raw crawl),
  * then score every document by its mean token log-likelihood ratio
  *
  *   llr(t) = ln((c_pos(t)+a)/(n_pos+aV)) - ln((c_neg(t)+a)/(n_neg+aV))
  *
  * with add-a smoothing over the seed vocabulary V; tokens unseen in the
  * seed get the smoothed floor on BOTH sides (their llr reduces to the
  * class-size prior, not a drop). Positive mean llr = "reads like the
  * positive seed"; the mean (not sum) keeps the score length-stable.
  *
  * Not in the reference (its story ends at table storage); first-class
  * here per the engine's training-data scope.
  *
  * Plan shape at 100 TB: tokenize + explode is map-only; the model is one
  * map-side-combined groupBy over the SEED's tokens (seeds are small by
  * construction, but nothing breaks if they aren't); scoring equi-joins
  * the corpus token stream to the per-token ratio table (broadcast when
  * the seed vocabulary is small, SMJ + AQE skew handling otherwise) and
  * ends in one per-doc aggregation. Totals (n_pos, n_neg, V) ride along
  * as a broadcast 1-row aggregate, not a driver collect. Fully
  * deterministic and SQL-replayable (tokenizer included).
  */
object QualityClassifier {

  /** (idCol, n_tokens, llr_mean) per scoreable document. `seed` provides
    * (seedTextCol, seedLabelCol boolean: true = positive class); documents
    * with zero tokens have no rows (gate them on
    * [[TextAnalysis.tokenCount]] like the perplexity filter). */
  def nbScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seed: DataFrame,
      seedTextCol: String,
      seedLabelCol: String,
      alpha: Double = 0.5): DataFrame = {
    val seedTok = seed.select(col(seedLabelCol).as("_g_lab"),
      explode(TextAnalysis.tokens(col(seedTextCol))).as("_g_t"))
    val counts = seedTok.groupBy("_g_t").agg(
      sum(when(col("_g_lab"), 1L).otherwise(0L)).as("_g_cp"),
      sum(when(col("_g_lab"), 0L).otherwise(1L)).as("_g_cn"))
    val totals = broadcast(seedTok.agg(
      sum(when(col("_g_lab"), 1L).otherwise(0L)).as("_g_np"),
      sum(when(col("_g_lab"), 0L).otherwise(1L)).as("_g_nn"),
      count_distinct(col("_g_t")).as("_g_v")))
    val llr =
      log((coalesce(col("_g_cp"), lit(0L)) + lit(alpha)) /
        (col("_g_np") + lit(alpha) * col("_g_v"))) -
      log((coalesce(col("_g_cn"), lit(0L)) + lit(alpha)) /
        (col("_g_nn") + lit(alpha) * col("_g_v")))
    docs.select(col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("_g_t"))
      .join(counts, Seq("_g_t"), "left")
      .crossJoin(totals)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(llr), 6).as("llr_mean"))
  }

  /** Keep documents whose [[nbScore]] mean llr is at or above `minLlr` —
    * the filter form (higher = more positive-seed-like). */
  def classifierFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seed: DataFrame,
      seedTextCol: String,
      seedLabelCol: String,
      minLlr: Double,
      alpha: Double = 0.5): DataFrame =
    docs.join(
      nbScore(docs, idCol, textCol, seed, seedTextCol, seedLabelCol, alpha)
        .filter(col("llr_mean") >= minLlr)
        .select(idCol),
      Seq(idCol), "left_semi")
}
