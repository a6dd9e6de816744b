package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, fingerprinting. All pure Column
  * expressions (codegen'd builtins + higher-order array functions) — no UDFs,
  * fully partition-parallel, no shuffle.
  */
object TextAnalysis {

  /** Whitespace tokens, lowercased; empty text -> empty array. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: splits on whitespace AND word/punct boundaries —
    * a cheap deterministic proxy for tokenizer counts. */
  def subwordCount(text: Column): Column =
    size(filter(split(lower(trim(text)), "(\\s+|(?<=\\W)|(?=\\W))"),
      t => length(t) > 0))

  /** Corpus-scale BPE merge statistics (the first iteration of BPE
    * tokenizer training): word frequencies, then frequency-weighted
    * adjacent character-pair counts. The pair explode runs over DISTINCT
    * words only — cost is |vocab|, not |corpus| — and both aggs are
    * map-side-combining groupBys, so at 100 TB the heavy token explode
    * feeds one combine-reduced shuffle of distinct words. Returns the
    * top-k candidate merges as (pair, n), ties broken by pair. */
  def bpePairCounts(df: DataFrame, textCol: String, topK: Int): DataFrame =
    df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .filter(length(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"), col("f"))
      .groupBy("pair").agg(sum(col("f")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)

  /** Distributed BPE TRAINING: learn `numMerges` merge rules over the
    * corpus. The corpus is scanned ONCE (word frequencies); every
    * iteration after that runs over the DISTINCT-word vocabulary only —
    * count frequency-weighted adjacent symbol pairs, take the top pair
    * (n desc, then (l, r) for determinism), and apply it greedily
    * left-to-right to the vocab symbol arrays via a codegen'd `aggregate`
    * fold (a merged token never re-fires its own rule in the same pass,
    * so one fold is the complete standard BPE merge application).
    *
    * Scale shape: per merge the vocab never leaves the cluster — the pair
    * count is a map-side-combining groupBy over |vocab| and only the
    * single winning pair reaches the driver (the kmeans-centroid
    * pattern). Returns the learned rules as (rank, l, r, n). */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val (vocab, merges) = bpeLoop(df, textCol, numMerges)
    val out = df.sparkSession.createDataFrame(merges).toDF("rank", "l", "r", "n")
    vocab.unpersist()
    out
  }

  /** Tokenize the corpus with the freshly-learned BPE rules and count
    * token frequencies (vocab-coverage analysis — the apply half of the
    * tokenizer). Words segment independently under whitespace
    * pre-tokenization, so the segmentation is computed once per DISTINCT
    * word and weighted by word frequency — the corpus text itself is
    * touched exactly once. Returns (token, n). */
  def bpeSegmentFrequencies(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val (vocab, _) = bpeLoop(df, textCol, numMerges)
    val out = vocab
      .select(explode(col("syms")).as("token"), col("f"))
      .groupBy("token").agg(sum(col("f")).as("n"))
      .cache()
    out.count()
    vocab.unpersist()
    out
  }

  /** Shared BPE training loop: returns the post-merge vocabulary (cached;
    * caller unpersists) and the learned rules. */
  private def bpeLoop(
      df: DataFrame,
      textCol: String,
      numMerges: Int): (DataFrame, Seq[(Int, String, String, Long)]) = {
    var vocab = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .select(col("w"), col("f"),
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))).as("syms"))
      .cache()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = vocab.filter(size(col("syms")) >= 2)
        .select(col("f"), explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("f")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, n))
        val prev = vocab
        vocab = vocab.withColumn("syms",
          aggregate(col("syms"), array().cast("array<string>"),
            (acc, x) => when(size(acc) > 0 &&
                element_at(acc, -1) === lit(l) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
              .otherwise(concat(acc, array(x)))))
          .cache()
        vocab.count()
        prev.unpersist()
        rank += 1
      }
    }
    (vocab, merges.toSeq)
  }

  def charCount(text: Column): Column = length(text)

  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") /
        length(text))

  def upperRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^A-Z]", "")).cast("double") / length(text))

  def digitRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^0-9]", "")).cast("double") / length(text))

  def meanWordLength(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, 0.0).otherwise(
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts))
  }

  /** Small per-language stopword lists for the heuristic scorers. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was",
      "for", "with", "as", "his", "on", "be", "at", "by", "not", "this", "are"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "des",
      "ein", "eine", "im", "nicht", "auf", "sich", "auch", "als", "werden"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "qui", "que",
      "pour", "sur", "pas", "avec", "sont", "ont", "mais", "aux"),
    "es" -> Seq("el", "los", "las", "una", "es", "por", "con", "para", "del",
      "se", "su", "lo", "como", "más", "pero", "sus", "hay"))

  /** Fraction of tokens that are stopwords of `lang` (duplicates counted). */
  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val ts = tokens(text)
    val sw = typedLit(stopwords(lang))
    when(size(ts) === 0, 0.0).otherwise(
      size(filter(ts, t => array_contains(sw, t))).cast("double") / size(ts))
  }

  /** Heuristic language ID: the language whose stopwords hit most tokens;
    * "und" (undetermined) when nothing hits. N-gram-free but the same
    * stopword-profile idea used by fasttext-style heuristics. */
  def langId(text: Column): Column = {
    val ts = tokens(text)
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(filter(ts, t => array_contains(typedLit(words), t))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  /** Composite quality score in [0,1]: penalizes extreme length, high
    * punctuation/digit density, low stopword density — the usual cheap
    * pretraining-quality filters. */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val lenScore = when(len < 10, len / 10.0)
      .when(len > 10000, greatest(lit(0.0), lit(1.0) - (len - 10000) / 90000.0))
      .otherwise(1.0)
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4.0)
    val digitScore = greatest(lit(0.0), lit(1.0) - digitRatio(text) * 4.0)
    val swScore = least(lit(1.0), stopwordRatio(text) * 4.0)
    round((lenScore * 0.25 + punctScore * 0.25 + digitScore * 0.25 + swScore * 0.25), 6)
  }

  /** Word k-shingles over a MATERIALIZED token-array column. Grams are k
    * element_at lookups (no per-gram array allocation).
    *
    * PERF CONTRACT: pass a column that is already a plain attribute (project
    * `tokens(text)` first). An expression captured inside a higher-order
    * lambda is re-evaluated PER ELEMENT — handing `tokens(text)` directly to
    * the lambda re-tokenizes the document once per gram, measured 7x slower
    * on a corpus-wide gram explosion (tools/ShingleProbe). */
  def wordShinglesOf(ts: Column, k: Int): Column =
    when(size(ts) < k, array(concat_ws(" ", ts)))
      .otherwise(transform(sequence(lit(0), size(ts) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(ts, i + j + 1)): _*)))

  /** Word k-shingles from raw text — convenience form; inside explodes /
    * repeated use, materialize `tokens(text)` and call [[wordShinglesOf]]
    * (see the perf contract above). */
  def wordShingles(text: Column, k: Int): Column =
    wordShinglesOf(tokens(text), k)

  /** Character n-gram shingles over a MATERIALIZED normalized-text column
    * (same perf contract as [[wordShinglesOf]]: the lambda captures `t`,
    * so pass a plain attribute, not an expression). */
  def charShinglesOf(t: Column, n: Int): Column =
    when(length(t) <= n, array(t))
      .otherwise(transform(sequence(lit(0), length(t) - n),
        i => t.substr(i + 1, lit(n))))

  /** Character n-gram shingles from raw text — convenience form; project
    * `lower(trim(text))` first and use [[charShinglesOf]] in hot paths. */
  def charShingles(text: Column, n: Int): Column =
    charShinglesOf(lower(trim(text)), n)

  /** Rolling-hash document fingerprint: min over shingle hashes (the
    * winnowing idea collapsed to one value) + full-content hash. */
  def fingerprint(text: Column): Column =
    GraftFunctions.xx64(regexp_replace(lower(trim(text)), "\\s+", " "))

  def minShingleFingerprint(text: Column, k: Int = 5): Column =
    array_min(transform(wordShingles(text, k), s => GraftFunctions.xx64(s)))

  def minShingleFingerprintOf(ts: Column, k: Int = 5): Column =
    array_min(transform(wordShinglesOf(ts, k), s => GraftFunctions.xx64(s)))

  /** SQL-replayable fingerprints: 60-bit values from md5 hex prefixes (15
    * hex chars < 2^60, so the signed-long parse is identical in DuckDB's
    * `('0x' || substring(md5(x), 1, 15))::BIGINT`). The xx64 forms above
    * stay the fast production default. */
  def fingerprintMd5(text: Column): Column =
    conv(substring(md5(regexp_replace(lower(trim(text)), "\\s+", " ")), 1, 15), 16, 10)
      .cast("long")

  def minShingleFingerprintMd5Of(ts: Column, k: Int = 5): Column =
    array_min(transform(wordShinglesOf(ts, k),
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))

  // ------------------------------------------------------------- PII scrub

  /** PII redaction patterns, applied in order (emails first so their digit
    * runs can't be phone-eaten). RE2-safe — no lookaround — so Spark's Java
    * regex and a DuckDB/RE2 replay produce identical output. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b" -> "<IP>",
    "\\+?\\d[\\d().\\- ]{7,}\\d" -> "<PHONE>")

  /** Redact emails / IPv4s / phone-number-shaped digit runs — the standard
    * pre-training scrub pass; pure codegen'd regexp_replace chain. */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  // ------------------------------------------------- repetition detection

  /** Fraction of duplicated elements in an array: 1 - distinct/total
    * (0 for empty). The Rae et al. (Gopher) repetition signal family. */
  def dupFraction(arr: Column): Column =
    when(size(arr) > 0, round(
      lit(1.0) - size(array_distinct(arr)).cast("double") / size(arr), 6))
      .otherwise(lit(0.0))

  /** Intra-document repetition metrics — duplicate word / 2-gram / 3-gram
    * fractions. High values flag boilerplate, keyword stuffing and
    * degenerate-generation text, the standard pre-training quality cut.
    * Pure column expressions (array HOFs): zero shuffle at any scale. */
  def repetitionScores(df: DataFrame, textCol: String = "text"): DataFrame =
    // tokens materialized ONCE (wordShinglesOf perf contract)
    df.withColumn("_g_ts", tokens(col(textCol)))
      .withColumn("dup_word_frac", dupFraction(col("_g_ts")))
      .withColumn("dup_2gram_frac", dupFraction(wordShinglesOf(col("_g_ts"), 2)))
      .withColumn("dup_3gram_frac", dupFraction(wordShinglesOf(col("_g_ts"), 3)))
      .drop("_g_ts")

  // ----------------------------------------------- Gopher-style doc filter

  /** The MassiveText/Gopher canonical stopword probe set (public rule set:
    * a document should contain at least 2 of these). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-shaped quality rules as per-rule boolean flag columns plus a
    * combined `keep` verdict: token-count window, mean-word-length window,
    * punctuation-density cap, >=2 distinct canonical stopwords. Flags stay
    * visible so downstream can tune/inspect instead of silently dropping. */
  def gopherFilter(df: DataFrame, textCol: String = "text",
      minTokens: Int = 50, maxTokens: Int = 100000): DataFrame = {
    val t = col(textCol)
    val ts = tokens(t)
    df.withColumn("flag_tokens",
        size(ts) >= minTokens && size(ts) <= maxTokens)
      .withColumn("flag_word_len",
        meanWordLength(t) >= 3.0 && meanWordLength(t) <= 10.0)
      .withColumn("flag_punct", punctRatio(t) <= 0.2)
      .withColumn("flag_stopwords",
        size(array_intersect(array_distinct(ts), typedLit(gopherStopwords))) >= 2)
      .withColumn("keep",
        col("flag_tokens") && col("flag_word_len") &&
          col("flag_punct") && col("flag_stopwords"))
  }

  /** Full per-document stats frame (the `documents` table operator). */
  def documentStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_chars_m", charCount(t))
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("mean_word_len", round(meanWordLength(t), 6))
      .withColumn("punct_ratio", round(punctRatio(t), 6))
      .withColumn("digit_ratio", round(digitRatio(t), 6))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 6))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
