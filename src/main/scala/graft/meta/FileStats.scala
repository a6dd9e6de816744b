package graft.meta

import org.json4s.{Formats, NoTypeHints}
import org.json4s.jackson.Serialization

/** Per-file column min/max statistics for metadata-level file skipping
  * (zone maps / data skipping — the standard lakehouse technique; cf.
  * Delta's per-AddFile stats and the reference's reliance on parquet
  * row-group statistics, native-io `apply_filters`).
  *
  * The reference prunes at the ROW-GROUP level inside its native reader;
  * storing file-level bounds in the commit metadata prunes whole files
  * BEFORE any task is launched — at 100 TB this turns a predicate scan
  * from "open every footer" into a driver-side metadata filter.
  *
  * Encoded as a compact JSON map `col -> {mn, mx, hn, an}` in
  * [[DataFileInfo.stats]]; absent column / absent field = unknown (never
  * skip on unknown).
  *
  * @param mn min value, string-encoded (numeric.toString; date = epoch-day;
  *           timestamp = epoch-micros; string = raw); None if all-null
  * @param mx max value, same encoding
  * @param hn file has at least one null in the column (or unknown)
  * @param an every row is null in the column (definite)
  */
case class ColStats(mn: Option[String], mx: Option[String], hn: Boolean, an: Boolean)

object FileStats {
  private implicit val fmts: Formats = Serialization.formats(NoTypeHints)

  /** Reserved pseudo-column carrying the file's exact ROW COUNT in `mn`
    * (footer metadata) — consumed by the DSv2 aggregate pushdown to answer
    * COUNT(*) from metadata. Skipped if a real column shadows the name. */
  val RowCountKey = "__graft_rows"

  def encode(m: Map[String, ColStats]): String =
    if (m.isEmpty) "" else Serialization.write(m)

  def decode(s: String): Map[String, ColStats] =
    if (s == null || s.isEmpty) Map.empty
    else try Serialization.read[Map[String, ColStats]](s)
    catch { case _: Exception => Map.empty }

  def rowCount(m: Map[String, ColStats]): Option[Long] =
    m.get(RowCountKey).flatMap(_.mn).flatMap(_.toLongOption)
}
