package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: remove (or flag)
  * training documents that share word n-grams with a held-out test /
  * benchmark set — the standard n-gram-overlap methodology of large-LM
  * training-data pipelines.
  *
  * Plan shape at 100 TB: the test set's distinct n-grams are tiny relative
  * to the corpus (benchmarks are thousands of documents, the corpus is
  * billions), so they BROADCAST — the corpus side then streams through one
  * explode projection, a broadcast hash semi-join, and a single
  * (doc, gram)-partial-agg shuffle keyed by doc id. No shuffle of the
  * corpus text itself, no crossJoin anywhere. Set `broadcastTest = false`
  * for a pathological giant test set to fall back to a plain equi-join on
  * the gram (both sides shuffle, still linear).
  *
  * Tokenizer is the shared whitespace [[TextAnalysis.tokens]], so the
  * whole operator is replayable in ANSI SQL (DuckDB-oracled).
  */
object Decontaminate {

  /** Word n-grams over a MATERIALIZED token-array column
    * ([[TextAnalysis.wordShinglesOf]] perf contract: the lambda captures
    * `toks`, so it must be a plain attribute); fewer than `n` tokens ->
    * empty array. Pure codegen'd column expression (no UDF). */
  def ngramsOf(toks: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Word n-grams from raw text — convenience form; hot paths project
    * `TextAnalysis.tokens(text)` first and call [[ngramsOf]]. */
  def ngrams(text: Column, n: Int): Column =
    ngramsOf(TextAnalysis.tokens(text), n)

  /** Per-document count of DISTINCT test-set n-grams it contains
    * (`idCol`, `n_hits`); documents with zero hits are absent. */
  def contaminationHits(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      testSet: DataFrame,
      testTextCol: String,
      n: Int = 8,
      broadcastTest: Boolean = true): DataFrame = {
    val testGrams = testSet
      .select(TextAnalysis.tokens(col(testTextCol)).as("_g_ts"))
      .select(explode(ngramsOf(col("_g_ts"), n)).as("_g_gram")).distinct()
    val probe = if (broadcastTest) broadcast(testGrams) else testGrams
    docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_g_ts"))
      .select(col(idCol), explode(ngramsOf(col("_g_ts"), n)).as("_g_gram"))
      .join(probe, "_g_gram")
      .groupBy(col(idCol))
      .agg(count_distinct(col("_g_gram")).as("n_hits"))
  }

  /** Docs with fewer than `minHits` distinct test n-grams (the decontaminated
    * corpus). */
  def decontaminate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      testSet: DataFrame,
      testTextCol: String,
      n: Int = 8,
      minHits: Long = 1,
      broadcastTest: Boolean = true): DataFrame = {
    val hits = contaminationHits(docs, idCol, textCol, testSet, testTextCol,
      n, broadcastTest)
    docs.join(hits.filter(col("n_hits") >= minHits), Seq(idCol), "left_anti")
  }

  /** SEMANTIC decontamination: flag corpus rows whose embedding is
    * near-identical (cosine >= `threshold`) to any test-set embedding —
    * catches paraphrased / reformatted leakage that n-gram overlap misses.
    *
    * Same candidate plan as [[Similarity.annJoin]] with the test set as
    * the QUERY side (benchmarks are small; the corpus is the indexed
    * side): map-only IVF assignment of the corpus, nprobe-exploded test
    * rows, one equi-join on cell — never |corpus| x |test|. Unlike the
    * KNN join there is NO top-k cap: EVERY candidate over the threshold is
    * a hit, so a benchmark question duplicated 50x in the corpus flags all
    * 50 copies (a rank cap would let the excess survive). Recall is
    * bounded by (nlist, nprobe) as in any IVF probe; exact duplicates
    * always land in their twin's cell. Returns (corpus id, test id,
    * cosine) per hit. */
  def semanticHits(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      testSet: DataFrame,
      testIdCol: String,
      testVecCol: String,
      threshold: Double,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame =
    Similarity.annCandidates(testSet, testIdCol, testVecCol,
      corpus, idCol, vecCol, nlist, nprobe)
      .filter(col("cosine") >= threshold)
      .select(col("_g_cid").as(idCol), col("_g_qid").as("test_id"),
        col("cosine"))

  /** The corpus minus every [[semanticHits]] row (anti-join on the id). */
  def decontaminateSemantic(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      testSet: DataFrame,
      testIdCol: String,
      testVecCol: String,
      threshold: Double,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame =
    corpus.join(
      semanticHits(corpus, idCol, vecCol, testSet, testIdCol, testVecCol,
        threshold, nlist, nprobe).select(idCol).distinct(),
      Seq(idCol), "left_anti")
}
