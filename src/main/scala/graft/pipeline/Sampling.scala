package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * All are hash-gate filters — a row is kept iff a multiplicative hash of its
  * id falls under the stratum's rate threshold. Properties that matter at
  * 100 TB: ZERO shuffle (pure map-side filter), reproducible across runs and
  * engines (Knuth's multiplicative hash is plain integer arithmetic, so the
  * DuckDB oracle replays it exactly), and composable (re-sampling a sample at
  * a lower rate yields a strict subset — the gates nest). */
object Sampling {

  private val Knuth = 2654435761L
  private val Mod = 1000000L

  /** The gate's modulus — rates are expressed as thresholds out of this. */
  private[pipeline] def ModValue: Long = Mod

  /** Uniform [0, 1e6) hash gate for a numeric id column. */
  def gate(idCol: Column): Column =
    pmod(idCol.cast("long") * lit(Knuth), lit(Mod))

  /** Deterministic uniform sample: keep rows with gate(id) < rate * 1e6. */
  def sample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(gate(col(idCol)) < lit((rate * Mod).toLong))

  /** Deterministic EXACT-k per group ("keep k docs per source"): rows win
    * by md5-permutation rank within their group — reproducible, seedable,
    * unbiased by any data ordering, and SQL-replayable. `idCol` must be
    * the corpus primary key (unique, non-null — see
    * [[Shuffle.permutationKey]]). One shuffle on the group key; each group
    * ranks independently (no global sort). For pathological giant groups
    * the window sort is O(n_g log n_g) in that partition — at curation
    * scale (groups = sources/languages) this is the standard shape. */
  def sampleGroupK(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      k: Int,
      seed: String = "graft"): DataFrame = {
    require(k > 0, "k must be positive")
    val key = Shuffle.permutationKey(seed, col(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(key, col(idCol))
    df.withColumn("_g_rn", row_number().over(w))
      .filter(col("_g_rn") <= k)
      .drop("_g_rn")
  }

  /** Temperature-based mixture rebalancing (the multilingual-corpus
    * p_g ∝ n_g^alpha reweighting, alpha in (0,1]): downsample every stratum
    * so kept counts are proportional to n_g^alpha without ever upsampling —
    * the smallest stratum keeps everything, larger strata shrink by
    * r_g = (n_min/n_g)^(1-alpha). One tiny per-stratum count aggregate
    * computes the rates; the gate itself is the same zero-shuffle
    * deterministic hash filter as [[stratifiedSample]], applied through a
    * broadcast join of the (few-row) rate table. For alpha = 0.5 the rate
    * is computed with sqrt (IEEE correctly-rounded in every engine), so
    * the thresholds — and therefore the kept set — replay bit-exactly in
    * the DuckDB oracle. */
  def temperatureSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_g_n"))
    val nMin = counts.agg(min(col("_g_n")).as("_g_nmin"))
    val exp = 1.0 - alpha
    val ratio = col("_g_nmin") / col("_g_n")
    val rate = if (exp == 0.5) sqrt(ratio) else pow(ratio, exp)
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col(strataCol).as("_g_stratum"), (rate * Mod).cast("long").as("_g_thresh"))
    // null-safe (<=>) so a NULL stratum reaches its own rate row (the count
    // aggregate produces one) instead of being silently dropped by the join
    df.join(broadcast(rates), col(strataCol) <=> col("_g_stratum"))
      .filter(gate(col(idCol)) < col("_g_thresh"))
      .drop("_g_stratum", "_g_thresh")
  }

  /** Deterministic stratified sample: per-stratum rates with a default —
    * e.g. downsample boilerplate-heavy languages, keep rare ones whole. */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit((defaultRate * Mod).toLong)) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit((rate * Mod).toLong)).otherwise(acc)
    }
    df.filter(gate(col(idCol)) < threshold)
  }
}
