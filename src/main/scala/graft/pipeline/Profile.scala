package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the ANALYZE/data-QA operator of a training-data
  * pipeline: per column, row count, null count, distinct count and
  * min/max, returned long-format (one row per column) so downstream
  * quality dashboards and drift checks consume it uniformly.
  *
  * One wide aggregate computes everything in a single pass over the data
  * (Catalyst plans the multi-distinct via Expand — one shuffle), then a
  * `stack` unpivots the single result row driver-free. Distinct counts
  * are EXACT by default (replayable against an external oracle);
  * `approxNdv = true` swaps in HyperLogLog approx_count_distinct, the
  * 100 TB default where a ±2% NDV is worth avoiding the Expand blow-up.
  *
  * min/max are emitted as strings so heterogeneous column types fit one
  * schema; cast floating-point columns to an explicit decimal first if
  * the profile must be bit-stable across engines. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String] = Nil,
      approxNdv: Boolean = false): DataFrame = {
    val cs = if (cols.nonEmpty) cols else df.columns.toSeq
    require(cs.nonEmpty, "profile() needs at least one column")
    val aggs = cs.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (approxNdv) approx_count_distinct(col(c))
         else count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cs.map(c =>
      s"'$c', __n - `__cnt_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`").mkString(", ")
    row.selectExpr(
      "__n AS n_rows",
      s"stack(${cs.length}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_s, max_s)")
      .select("col_name", "n_rows", "n_nulls", "n_distinct", "min_s", "max_s")
  }
}
