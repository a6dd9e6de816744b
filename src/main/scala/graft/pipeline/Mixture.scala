package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-mixture planning: turn per-source token inventories + target
  * mixture weights into a concrete, deterministic sampling plan (epochs per
  * source), and materialize that plan as an epoch-expanded corpus.
  *
  * This is the step between corpus curation and a training run: given "I
  * want a B-token mix that is 60% web, 30% code, 10% books", compute how
  * many passes (possibly fractional, possibly capped) over each source the
  * budget implies, then emit the epoch-expanded document set.
  *
  * Scale properties: the plan is one tiny per-source aggregate (rows =
  * sources, broadcast everywhere after); materialization is a map-side
  * `explode(sequence(...))` + the zero-shuffle [[Sampling.gate]] hash
  * filter for the fractional final epoch — no join against anything big,
  * no shuffle of the corpus itself, and every decision replays bit-exactly
  * in SQL (integer hash gate, round(_,6) on reported epoch counts). */
object Mixture {

  /** Per-source sampling plan for a token budget.
    *
    * For each source s with available tokens n_s and normalized weight w_s:
    * target_s = budget * w_s; epochs_s = min(target_s / n_s, maxEpochs).
    * Shortfall (when the cap bites or a source is absent from `weights`)
    * is reported, not silently redistributed — redistributing would change
    * every other source's dedup/replication profile behind the caller's
    * back.
    *
    * Output (one row per source present in `df`): source, available_tokens,
    * weight, target_tokens, epochs (round 6), full_epochs = floor(epochs),
    * fractional_rate (round 6), planned_tokens (round 2), shortfall_tokens
    * (round 2). */
  def plan(
      df: DataFrame,
      sourceCol: String,
      tokenCol: String,
      weights: Map[String, Double],
      budgetTokens: Long,
      maxEpochs: Double = 4.0): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(maxEpochs > 0, "maxEpochs must be positive")
    val wSum = weights.values.sum
    require(wSum > 0, "at least one weight must be positive")
    // normalized weight as a literal CASE over the (few) sources — absent
    // sources get weight 0 (kept in the plan with epochs 0, so the caller
    // sees them dropped rather than wondering where they went)
    val w = weights.foldLeft(lit(0.0)) { case (acc, (s, v)) =>
      when(col("source") === s, lit(v / wSum)).otherwise(acc)
    }
    val avail = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(col(tokenCol)).cast("double").as("available_tokens"))
      .withColumn("weight", w)
    val target = col("weight") * lit(budgetTokens.toDouble)
    val epochs = least(target / col("available_tokens"), lit(maxEpochs))
    avail
      .withColumn("target_tokens", round(target, 2))
      .withColumn("epochs", round(epochs, 6))
      .withColumn("full_epochs", floor(epochs))
      .withColumn("fractional_rate", round(epochs - floor(epochs), 6))
      .withColumn("planned_tokens", round(epochs * col("available_tokens"), 2))
      .withColumn("shortfall_tokens",
        round(greatest(target - epochs * col("available_tokens"), lit(0.0)), 2))
  }

  /** Materialize a plan: each document appears floor(epochs) times (epoch
    * numbers 0..full-1) plus once more in the final fractional epoch iff
    * its [[Sampling.gate]] hash falls under fractional_rate — the same
    * deterministic, engine-replayable gate the samplers use, so the kept
    * set of the partial epoch is a uniform, reproducible subset.
    *
    * The plan side is broadcast (rows = sources); the corpus side is
    * map-only: explode over `sequence(0, full_epochs)` then filter the
    * final epoch by the hash gate. Output = input columns + `epoch`. */
  def materialize(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      planDf: DataFrame): DataFrame = {
    val p = planDf.select(
      col("source").as("_m_source"),
      col("full_epochs").cast("int").as("_m_full"),
      (col("fractional_rate") * lit(Sampling.ModValue)).cast("long")
        .as("_m_thresh"))
    df.join(broadcast(p), col(sourceCol) <=> col("_m_source"))
      .withColumn("epoch",
        explode(sequence(lit(0), col("_m_full"))))
      // epochs 0..full-1 keep everything; epoch == full is the fractional
      // pass, gated by the deterministic hash
      .filter(col("epoch") < col("_m_full") ||
        Sampling.gate(col(idCol)) < col("_m_thresh"))
      .drop("_m_source", "_m_full", "_m_thresh")
  }
}
