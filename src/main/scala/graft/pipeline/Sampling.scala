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

  /** Uniform [0, 1e6) hash gate for a numeric id column. */
  def gate(idCol: Column): Column =
    pmod(idCol.cast("long") * lit(Knuth), lit(Mod))

  /** Deterministic uniform sample: keep rows with gate(id) < rate * 1e6. */
  def sample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(gate(col(idCol)) < lit((rate * Mod).toLong))

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
