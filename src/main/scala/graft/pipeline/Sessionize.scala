package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: consecutive events of one
  * key belong to the same session while the gap between them is <= `gap`
  * (in `tsCol` units — pass epoch micros for timestamps).
  *
  * Plan: ONE window over the (key) shuffle — lag to detect session breaks,
  * running sum of breaks to number sessions — then an optional per-session
  * aggregate reusing the same partitioning. Linear, no joins; the classic
  * scale shape (identical to what you'd run over 100 TB of clickstream —
  * key-partitioned, AQE-splittable).
  */
object Sessionize {

  /** Per-event session assignment: input columns plus `session_seq`
    * (0-based per key, in ts order). */
  def assign(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gap: Long): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key column")
    val w = Window.partitionBy(keys.map(graft.util.SchemaUtil.qcol): _*)
      .orderBy(graft.util.SchemaUtil.qcol(tsCol))
    val isBreak = when(
      col(tsCol) - lag(col(tsCol), 1).over(w) > gap, 1L).otherwise(0L)
    events.withColumn("session_seq",
      sum(isBreak).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-session summaries: keys, session_seq, session_start, session_end,
    * n_events. */
  def sessions(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gap: Long): DataFrame =
    assign(events, keys, tsCol, gap)
      .groupBy((keys.map(graft.util.SchemaUtil.qcol) :+ col("session_seq")): _*)
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
}
