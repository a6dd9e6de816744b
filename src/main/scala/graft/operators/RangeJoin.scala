package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — attach every point to the interval(s) containing
  * it, per key: `points.p BETWEEN intervals.start AND intervals.end`. Spark
  * plans a raw inequality predicate as a (broadcast) nested-loop join —
  * O(n*m) and a non-starter at scale.
  *
  * The scale shape here is BIN EQUI-JOIN: pick a bin width near the typical
  * interval length; each point maps to exactly ONE bin, each interval
  * explodes to the bins it overlaps (bounded by `maxBinsPerInterval`), and
  * the join becomes a plain hash equi-join on (keys, bin) + a residual
  * BETWEEN filter. Every candidate pair meets in exactly one bin (the
  * point's), so no dedup pass is needed. One shuffle each side, linear in
  * input + true matches.
  */
object RangeJoin {

  /** Exact floor-division binning (safe for negative values, no
    * double-precision loss on epoch-microsecond magnitudes). */
  private def binOf(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / w).cast("long")

  /** @param points    probe side; all columns kept
    * @param intervals interval side; must hold `keys`, `startCol`, `endCol`
    *                  (inclusive bounds) and `valueCols`
    * @param pointCol  numeric point column (for timestamps, pass epoch
    *                  micros, e.g. `unix_micros(col("ts"))`, on both sides)
    * @param binWidth  bin size in `pointCol` units; choose ~typical interval
    *                  length so most intervals explode to 1-2 bins
    * @param maxBinsPerInterval hard guard: an interval spanning more bins
    *                  fails the job (degenerate intervals are the skew
    *                  hazard of the bin approach — widen binWidth instead)
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      valueCols: Seq[String],
      binWidth: Long,
      maxBinsPerInterval: Int = 1024): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(keys.nonEmpty, "range join needs at least one equi-key")
    val p = points.withColumn("_g_bin", binOf(col(pointCol), binWidth))
    val spanOk = binOf(col(endCol), binWidth) - binOf(col(startCol), binWidth) <
      lit(maxBinsPerInterval.toLong)
    val i = intervals
      .select((keys.map(col) ++ Seq(col(startCol), col(endCol)) ++
        valueCols.map(col)): _*)
      // assert_true fails the job on a degenerate interval instead of
      // silently exploding the candidate space
      .filter(coalesce(assert_true(spanOk,
        lit(s"interval spans >= $maxBinsPerInterval bins of $binWidth — " +
          "increase binWidth")).cast("boolean"), lit(true)))
      .withColumn("_g_bin", explode(sequence(
        binOf(col(startCol), binWidth), binOf(col(endCol), binWidth))))
    p.join(i, (keys :+ "_g_bin").toSeq)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_g_bin", startCol, endCol)
  }
}
