package graft.read

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import graft.meta.{ColStats, FileStats, ResolvedFile, TableInfo}
import graft.write.StatsCompare

/** Metadata-level file skipping over [[graft.meta.FileStats]] bounds.
  *
  * Three-valued evaluation: a file is dropped only when its stats PROVE no
  * row can satisfy the filters; unknown (missing stats, unsupported filter,
  * schema-evolved column) always keeps the file. Spark re-applies every
  * filter above the scan, so skipping is purely an optimization and can
  * never change results — PROVIDED the filters are merge-safe, which
  * [[prune]] enforces with the same rule the reader-level pushdown uses
  * (key-only filters once a partition has multiple sorted runs: a merged
  * row's key equals its key in every contributing file, so a key-range
  * exclusion is exact; a VALUE column's merged result could differ from a
  * dropped file's contribution, so value filters only skip on single-run /
  * non-PK data).
  */
object StatsSkipping {

  /** Drop files that provably contain no matching row. */
  def prune(
      info: TableInfo,
      schema: StructType,
      files: Seq[ResolvedFile],
      filters: Seq[Filter]): Seq[ResolvedFile] = {
    if (filters.isEmpty || files.isEmpty) return files
    val multiRun = info.hasPrimaryKey &&
      files.groupBy(_.partitionDesc).values.exists(_.map(_.commitOrdinal).distinct.size > 1)
    val keyCols = (info.rangeColumns ++ info.hashColumns).toSet
    val safe =
      if (!multiRun) filters
      else filters.filter(_.references.forall(keyCols.contains))
    if (safe.isEmpty) return files
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    files.filter { f =>
      val st = FileStats.decode(f.file.stats)
      st.isEmpty || safe.forall(mightMatch(_, st, types))
    }
  }

  /** Rewrite-granularity pruning for the tiered UPDATE/DELETE path: a
    * rewrite must replace ALL runs of a (partition, bucket) together (a
    * partial-run rewrite would reorder commit ordinals and corrupt the
    * merge), so skipping here drops whole GROUPS — a (partition, bucket)
    * of a PK table, a single file of a non-PK table — and only when no
    * file in the group might match. Per-group merge-safety: value filters
    * may prune a single-run group, key filters any group. */
  def pruneGroups(
      info: TableInfo,
      schema: StructType,
      files: Seq[ResolvedFile],
      filters: Seq[Filter]): Seq[ResolvedFile] = {
    if (filters.isEmpty || files.isEmpty) return files
    val keyCols = (info.rangeColumns ++ info.hashColumns).toSet
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    files.groupBy(f =>
      if (info.hasPrimaryKey) (f.partitionDesc, f.file.bucketId.toString)
      else (f.partitionDesc, f.file.path))
      .values.filter { group =>
        val multiRun = group.map(_.commitOrdinal).distinct.size > 1
        val safe =
          if (!multiRun) filters
          else filters.filter(_.references.forall(keyCols.contains))
        safe.isEmpty || group.exists { f =>
          val st = FileStats.decode(f.file.stats)
          st.isEmpty || safe.forall(mightMatch(_, st, types))
        }
      }.flatten.toSeq
  }

  /** Could any row of a file with these stats satisfy the filter?
    * Unknown => true. */
  def mightMatch(
      filter: Filter,
      stats: Map[String, ColStats],
      types: Map[String, DataType]): Boolean = filter match {
    case And(l, r) => mightMatch(l, stats, types) && mightMatch(r, stats, types)
    case Or(l, r) => mightMatch(l, stats, types) || mightMatch(r, stats, types)
    case EqualTo(a, v) => rangeContains(a, v, stats, types)
    case EqualNullSafe(a, null) => stats.get(a).forall(_.hn)
    case EqualNullSafe(a, v) => rangeContains(a, v, stats, types)
    case In(a, vs) =>
      if (vs == null || vs.isEmpty) true
      else vs.exists(v => rangeContains(a, v, stats, types))
    case GreaterThan(a, v) => cmpMax(a, v, stats, types).forall(_ > 0)
    case GreaterThanOrEqual(a, v) => cmpMax(a, v, stats, types).forall(_ >= 0)
    case LessThan(a, v) => cmpMin(a, v, stats, types).forall(_ > 0)
    case LessThanOrEqual(a, v) => cmpMin(a, v, stats, types).forall(_ >= 0)
    case IsNull(a) => stats.get(a).forall(_.hn)
    case IsNotNull(a) => !stats.get(a).exists(_.an)
    case StringStartsWith(a, p) if p != null => prefixOverlaps(a, p, stats)
    case _ => true // Not(...) and anything else: keep
  }

  /** encode a filter literal into the stats string domain; None = unknown */
  private def encodeLit(v: Any, dt: DataType): Option[String] = (v, dt) match {
    case (null, _) => None
    case (n: Number, ByteType | ShortType | IntegerType | LongType) =>
      Some(n.longValue.toString)
    case (n: Number, FloatType | DoubleType) => Some(n.doubleValue.toString)
    case (s: String, StringType) => Some(s)
    case (s: org.apache.spark.unsafe.types.UTF8String, StringType) => Some(s.toString)
    case (d: java.sql.Date, DateType) => Some(d.toLocalDate.toEpochDay.toString)
    case (d: java.time.LocalDate, DateType) => Some(d.toEpochDay.toString)
    case (t: java.sql.Timestamp, TimestampType) =>
      Some((math.multiplyExact(t.getTime / 1000, 1000000L) +
        t.getNanos / 1000).toString)
    case (i: java.time.Instant, TimestampType) =>
      Some((math.multiplyExact(i.getEpochSecond, 1000000L) + i.getNano / 1000).toString)
    case (t: java.time.LocalDateTime, TimestampNTZType) =>
      val i = t.toInstant(java.time.ZoneOffset.UTC)
      Some((math.multiplyExact(i.getEpochSecond, 1000000L) + i.getNano / 1000).toString)
    case _ => None
  }

  /** compare(v, min) — None = unknown / must keep */
  private def cmpMin(a: String, v: Any, stats: Map[String, ColStats],
      types: Map[String, DataType]): Option[Int] =
    for {
      cs <- stats.get(a); if !cs.an
      dt <- types.get(a)
      mn <- cs.mn
      lit <- encodeLit(v, dt)
    } yield StatsCompare.compare(dt, lit, mn)

  private def cmpMax(a: String, v: Any, stats: Map[String, ColStats],
      types: Map[String, DataType]): Option[Int] =
    for {
      cs <- stats.get(a); if !cs.an
      dt <- types.get(a)
      mx <- cs.mx
      lit <- encodeLit(v, dt)
    } yield StatsCompare.compare(dt, mx, lit)

  private def rangeContains(a: String, v: Any, stats: Map[String, ColStats],
      types: Map[String, DataType]): Boolean =
    stats.get(a) match {
      case Some(cs) if cs.an => false // all null: no non-null value matches
      case _ =>
        cmpMin(a, v, stats, types).forall(_ >= 0) &&
          cmpMax(a, v, stats, types).forall(_ >= 0)
    }

  /** [min, max] overlaps the set of strings with prefix `p`:
    * max >= p (byte order) AND min's p-length byte prefix <= p. */
  private def prefixOverlaps(a: String, p: String,
      stats: Map[String, ColStats]): Boolean =
    stats.get(a) match {
      case Some(cs) if cs.an => false
      case Some(cs) =>
        val pb = p.getBytes(StandardCharsets.UTF_8)
        val maxOk = cs.mx.forall(mx =>
          StatsCompare.compareUtf8(mx, p) >= 0)
        val minOk = cs.mn.forall { mn =>
          val mb = mn.getBytes(StandardCharsets.UTF_8)
          val pre = java.util.Arrays.copyOf(mb, math.min(mb.length, pb.length))
          java.util.Arrays.compareUnsigned(pre,
            java.util.Arrays.copyOf(pb, pre.length)) <= 0
        }
        maxOk && minOk
      case None => true
    }
}
