package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional (Morton / Z-order) clustering value.
  *
  * `GraftTable.cluster(cols)` gives the linear form: range-partition + sort
  * on the column list, so the FIRST column gets tight per-file min/max
  * bounds and predicates over it skip files. When queries filter several
  * independent columns (tenant AND time, user AND score), linear clustering
  * only serves the leading column; interleaving the dimensions' bits keeps
  * every file's bounding box small in ALL dimensions at once, so
  * [[graft.read.StatsSkipping]] prunes on whichever dimension the query
  * constrains. The same technique the wider lakehouse ecosystem exposes as
  * OPTIMIZE ... ZORDER BY; the reference's own surface has no equivalent —
  * this is part of the 100 TB-scale additions.
  *
  * Implementation is deliberately all built-in Spark expressions (fully
  * codegen-friendly, no UDFs):
  *   1. one `approxQuantile` pass computes per-dimension quantile boundaries
  *      (equi-DEPTH cells — robust to skew, unlike min/max-scaled cells);
  *   2. per row, each dimension's cell id = count of boundaries <= value
  *      (an `aggregate` HOF scan over <=255 boundary literals);
  *   3. the z-value interleaves the cell ids' bits: bit i of dimension c
  *      lands at position i*k + c of a LongType column.
  *
  * The z-value column only drives `repartitionByRange` during a clustering
  * rewrite — it is never stored; per-file skipping bounds remain the real
  * columns' min/max collected by [[graft.write.FileStatsCollector]].
  */
object ZOrder {

  /** Cells-per-dimension exponent: 8 bits = 256 quantile cells, plenty of
    * resolution for FILE-level pruning (a clustering job writes far fewer
    * files per partition than cells) while keeping the per-row cost at
    * 8*k shift-mask terms. */
  val BitsPerDim = 8

  /** Z-value of `cols` over `df`'s data distribution, as a LongType column.
    * Nulls (and NaNs) sort into cell 0. Dimensions are capped at 7 so the
    * interleaved value fits a signed long with 8 bits each. */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = BitsPerDim): Column = {
    val k = cols.length
    require(k >= 1, "z-order needs at least one column")
    require(k * bits <= 62, s"too many z-order dimensions: $k at $bits bits")
    val cells = 1 << bits
    val probs = (1 until cells).map(_.toDouble / cells).toArray
    val casted = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    // one pass over the data; boundary error of a quarter-cell keeps cell
    // population within ~25% of uniform — ample for file-granularity skipping
    val bounds = casted.stat.approxQuantile(cols.toArray, probs, 0.25 / cells)
    val cellCols = cols.zip(bounds.toSeq).map { case (c, bs) =>
      val uniq = bs.distinct.filterNot(_.isNaN).sorted.toSeq
      val v = coalesce(col(c).cast("double"), lit(Double.NegativeInfinity))
      // cell id = #boundaries <= v: a linear scan of the boundary-literal
      // array (<=255 codegen'd compares), monotone in v by construction
      aggregate(typedlit(uniq), lit(0),
        (acc, b) => acc + when(v >= b, 1).otherwise(0)).cast("long")
    }
    val terms = for {
      i <- 0 until bits
      (cell, c) <- cellCols.zipWithIndex
    } yield shiftleft(shiftright(cell, i).bitwiseAND(lit(1L)), i * k + c)
    terms.reduce(_ + _)
  }
}
