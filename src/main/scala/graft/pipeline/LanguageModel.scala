package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet-style "perplexity
  * filter" of LLM data pipelines: score each document by the mean log
  * probability of its bigrams under an add-k-smoothed bigram model, so
  * gibberish / boilerplate / wrong-language text (surprising bigrams)
  * scores low and fluent text scores high. Filter or stratify on the score.
  *
  * Not in the reference (its story ends at table storage); first-class here
  * per the engine's training-data scope.
  *
  *   score(d) = mean over bigrams (w1,w2) of d of
  *              ln( (c(w1,w2) + k) / (c(w1·) + k·V) )
  *
  * where c(w1,w2)/c(w1·) are corpus bigram/context counts and V is the
  * corpus vocabulary size. Model TRAINING and document SCORING are the same
  * job graph: counts come from `trainOn` (a curated reference corpus) or
  * from `docs` itself.
  *
  * Plan shape at 100 TB: tokenize + bigram-explode is map-only; the model
  * is two hash aggregations (map-side combined) over 8-byte-hashable
  * grams; scoring joins the doc bigram stream to the two count tables by
  * equi-join (model tables can exceed broadcast size — Spark picks SMJ/
  * shuffled-hash and AQE handles gram skew) and one final per-doc
  * aggregation. Document text itself crosses the wire only as bigrams.
  * V rides along as a broadcast 1-row table, not a driver-side collect.
  *
  * Deterministic and fully SQL-replayable (tokenizer included) — the
  * DuckDB oracle recomputes model + scores verbatim. Documents with fewer
  * than 2 tokens have no bigrams and drop out (standard for perplexity
  * filters; gate short docs on [[TextAnalysis.tokenCount]] instead).
  */
object LanguageModel {

  /** (doc id, n_bigrams, avg_logp) per scoreable document. `k` is the
    * add-k smoothing constant. */
  def bigramScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Double = 0.5,
      trainOn: Option[DataFrame] = None): DataFrame = {
    def bigramsOf(df: DataFrame): DataFrame =
      df.select(col(idCol),
        TextAnalysis.tokens(col(textCol)).as("_g_ts"))
        .select(col(idCol),
          explode(Decontaminate.ngramsOf(col("_g_ts"), 2)).as("_g_bg"))
        .withColumn("_g_w1", substring_index(col("_g_bg"), " ", 1))

    val corpus = trainOn.getOrElse(docs)
    val corpusBigrams = bigramsOf(corpus)
    val c2 = corpusBigrams.groupBy("_g_bg").agg(count(lit(1)).as("_g_c2"))
    val c1 = corpusBigrams.groupBy("_g_w1").agg(count(lit(1)).as("_g_c1"))
    val vocab = broadcast(corpus
      .select(explode(TextAnalysis.tokens(col(textCol))).as("_g_t"))
      .agg(count_distinct(col("_g_t")).as("_g_v")))

    // LEFT joins with count 0 for unseen events: a bigram absent from the
    // training corpus must receive the smoothed floor ln(k / (c(w1)+kV))
    // — an inner join would silently drop exactly the surprising bigrams
    // a perplexity filter exists to punish (matters when `trainOn` is a
    // separate reference corpus)
    bigramsOf(docs)
      .join(c2, Seq("_g_bg"), "left")
      .join(c1, Seq("_g_w1"), "left")
      .crossJoin(vocab)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(
          (coalesce(col("_g_c2"), lit(0L)) + lit(k)) /
            (coalesce(col("_g_c1"), lit(0L)) + lit(k) * col("_g_v")))), 6)
          .as("avg_logp"))
  }

  /** Keep documents whose [[bigramScore]] is at or above `minLogP` — the
    * filter form (higher = more fluent under the model). */
  def perplexityFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLogP: Double,
      k: Double = 0.5,
      trainOn: Option[DataFrame] = None): DataFrame =
    docs.join(
      bigramScore(docs, idCol, textCol, k, trainOn)
        .filter(col("avg_logp") >= minLogP)
        .select(idCol),
      Seq(idCol), "left_semi")
}
