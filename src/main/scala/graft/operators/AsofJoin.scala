package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the canonical event/feature alignment
  * operator for training-data pipelines: for every left row, attach the
  * single most recent right row for the same keys with `rightTs <= leftTs`
  * (backward; forward = first following row). Spark has no native as-of
  * join; a naive implementation is an inequality join (O(n*m) explosion or
  * a range cross-product).
  *
  * This one is the SCALE shape: tag both sides, UNION them, and run ONE
  * window (partition by keys, order by ts) carrying the latest right payload
  * forward with `last(_, ignoreNulls)` — a single shuffle on the join keys,
  * linear work, no pair explosion, AQE-skew-splittable. The same plan works
  * unchanged at 100 TB because every row is touched exactly once and the
  * only exchange is the keys hash partition both sides need anyway.
  */
object AsofJoin {

  /** Backward as-of join (most recent right row at-or-before the left ts).
    *
    * @param left      probe side; all its columns are kept
    * @param right     reference side; must contain `keys`, `rightTs`, and
    *                  `valueCols`
    * @param keys      equi-join keys present on both sides
    * @param leftTs    left ordering column (timestamp or numeric)
    * @param rightTs   right ordering column
    * @param valueCols right columns appended to the output (null when no
    *                  right row is at-or-before the left row); rename on the
    *                  right side first to avoid clashes with left columns
    * @param tolerance max allowed (leftTs - rightTs), as a Column matching
    *                  the ts type arithmetic (e.g. `expr("INTERVAL 1 HOUR")`
    *                  for timestamps, `lit(100L)` for numerics); matches
    *                  older than that become nulls
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      tolerance: Option[Column] = None): DataFrame =
    run(left, right, keys, leftTs, rightTs, valueCols, tolerance, forward = false)

  /** Forward as-of join (first right row at-or-after the left ts). */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      tolerance: Option[Column] = None): DataFrame =
    run(left, right, keys, leftTs, rightTs, valueCols, tolerance, forward = true)

  private def run(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      tolerance: Option[Column],
      forward: Boolean): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    val lCols = left.columns.toSeq
    // right payload travels as one struct; its ts rides along for the
    // tolerance check. The secondary sort on the payload struct makes ties
    // (several right rows at one ts) deterministic: max payload wins.
    val rPayload = struct((col(rightTs).as("_g_rts") +: valueCols.map(col)): _*)
    val rSel = right.select(
      (keys.map(col) :+ col(rightTs).as("_g_ts")) :+ rPayload.as("_g_r"): _*)
    val lSel = left.select(
      (keys.map(col) :+ col(leftTs).as("_g_ts")) :+
        struct(lCols.map(col): _*).as("_g_l"): _*)
    val rType = rSel.schema("_g_r").dataType
    val lType = lSel.schema("_g_l").dataType

    // side ordering puts right rows BEFORE left rows at equal ts so the
    // boundary is inclusive (rightTs <= leftTs), mirroring SQL ASOF JOIN
    val u = lSel
      .withColumn("_g_side", lit(1))
      .withColumn("_g_r", lit(null).cast(rType))
      .unionByName(rSel
        .withColumn("_g_side", lit(0))
        .withColumn("_g_l", lit(null).cast(lType)))

    val ord =
      if (forward) Seq(col("_g_ts").desc, col("_g_side").asc, col("_g_r").desc)
      else Seq(col("_g_ts").asc, col("_g_side").asc, col("_g_r").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u.withColumn("_g_m", last(col("_g_r"), ignoreNulls = true).over(w))
      .filter(col("_g_side") === 1)

    val withinTol = tolerance match {
      case None => col("_g_m").isNotNull
      case Some(tol) if forward =>
        col("_g_m").isNotNull && col("_g_m._g_rts") <= col("_g_ts") + tol
      case Some(tol) =>
        col("_g_m").isNotNull && col("_g_m._g_rts") >= col("_g_ts") - tol
    }
    val gated = matched.withColumn("_g_m", when(withinTol, col("_g_m")))
    gated.select(lCols.map(c => col(s"_g_l.$c").as(c)) ++
      valueCols.map(c => col(s"_g_m.$c").as(c)): _*)
  }
}
