package graft.write

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.meta.{ColStats, DataFileInfo, FileStats}

/** Write-side collection of per-file column min/max from parquet footers.
  *
  * Runs after [[TransactionalWrite.writeFiles]] has produced a commit's
  * files: the footers were just written and are page-cache hot, so reading
  * them costs ~1 ms each. Small commits read on the driver; large commits
  * fan the footer reads out as a Spark job so collection scales with the
  * cluster, not the driver.
  *
  * Only top-level columns with a stable, order-preserving parquet encoding
  * are collected (int/long/float/double/date/string, timestamp when written
  * as INT64 micros); everything else stays unknown and is never skipped on.
  */
object FileStatsCollector {

  /** Table property: set "false" to skip collection. */
  val EnabledProp = "graft.stats.enabled"
  /** Table property: max number of leading schema columns indexed. */
  val NumColsProp = "graft.stats.cols"
  val DefaultNumCols = 32

  private val DriverReadLimit = 256

  /** The collection spec for a table+schema, or None when collection is
    * disabled / nothing is indexable. Shared between driver-side [[attach]]
    * and the task-side [[StatsCommitProtocol]]. */
  def specFor(table: graft.meta.TableInfo,
      schema: StructType): Option[StatsCommitProtocol.Spec] = {
    if (table.properties.get(EnabledProp).contains("false")) return None
    val nCols = table.properties.get(NumColsProp).map(_.toInt).getOrElse(DefaultNumCols)
    // leading-columns cap (same idea as Delta's dataSkippingNumIndexedCols):
    // bound the metadata size on wide tables
    val indexed: Map[String, DataType] = schema.fields.take(nCols).collect {
      case f if supported(f.dataType) => f.name -> f.dataType
    }.toMap
    if (indexed.isEmpty) None
    // the synthetic row-count entry must never collide with a REAL column of
    // the reserved name anywhere in the schema (not just the indexed prefix):
    // a shadowed entry would feed bogus bounds to StatsSkipping.mightMatch
    else Some(StatsCommitProtocol.Spec(indexed,
      schema.fieldNames.contains(FileStats.RowCountKey)))
  }

  def attach(
      spark: SparkSession,
      table: graft.meta.TableInfo,
      schema: StructType,
      allFiles: Seq[(String, DataFileInfo)]): Seq[(String, DataFileInfo)] = {
    // files that already carry stats (task-side collection) are kept as-is
    val files = allFiles.filter(_._2.stats.isEmpty)
    if (files.isEmpty) return allFiles
    val sp = specFor(table, schema) match {
      case Some(s) => s
      case None => return allFiles
    }
    val indexed = sp.indexed
    val rowCountShadowed = sp.rowCountShadowed

    val paths = files.map(f => f._2.path -> f._2.size)
    val statsByPath: Map[String, String] =
      if (paths.size <= DriverReadLimit && paths.forall(_._1.startsWith("/"))) {
        // local driver-side read: RAW local FS (no .crc checksum companion
        // reads), known file length (no getFileStatus round-trip), small
        // thread pool — ~1 ms per footer instead of ~15 through the
        // checksummed Hadoop path
        val conf = spark.sparkContext.hadoopConfiguration
        val fs = new org.apache.hadoop.fs.RawLocalFileSystem()
        fs.initialize(java.net.URI.create("file:///"), conf)
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(8, paths.size))
        try {
          paths.map { case (p, len) =>
            p -> pool.submit(new java.util.concurrent.Callable[String] {
              def call(): String = readFileStats(rawInputFile(fs, p, len), indexed, rowCountShadowed)
            })
          }.map { case (p, f) => p -> f.get() }.toMap
        } finally pool.shutdown()
      } else {
        // DataTypes are serializable; each task builds a local Hadoop conf
        spark.sparkContext
          .parallelize(paths, math.min(paths.size, 64))
          .map { case (p, _) =>
            p -> readFileStats(
              HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(p),
                new Configuration()), indexed, rowCountShadowed)
          }
          .collect().toMap
      }
    allFiles.map { case (desc, f) =>
      if (f.stats.nonEmpty) (desc, f)
      else (desc, f.copy(stats = statsByPath.getOrElse(f.path, "")))
    }
  }

  /** Single-file footer read for the task-side collector: raw local FS
    * when the path is a plain local file (skips the .crc companion reads),
    * the Hadoop path otherwise. */
  private[write] def readLocalOrHadoop(path: String, conf: Configuration,
      indexed: Map[String, DataType], rowCountShadowed: Boolean): String = {
    val local = new java.io.File(path)
    val in =
      if (local.isFile) {
        val fs = new org.apache.hadoop.fs.RawLocalFileSystem()
        fs.initialize(java.net.URI.create("file:///"), conf)
        rawInputFile(fs, path, local.length())
      } else HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(path), conf)
    readFileStats(in, indexed, rowCountShadowed)
  }

  /** Exact footer row count (driver-side, ~1 ms on a page-cache-hot local
    * file). Used by the flat-bucket write to drop the zero-row files
    * FileFormatWriter creates for empty partitions; -1 on read failure
    * (caller must then keep the file — dropping is the optimization,
    * keeping is the safe default). */
  // one raw local FS for the row-count probes (stateless over local files;
  // constructing + initializing one per footer was pure churn)
  private lazy val sharedRawFs: org.apache.hadoop.fs.FileSystem = {
    val fs = new org.apache.hadoop.fs.RawLocalFileSystem()
    fs.initialize(java.net.URI.create("file:///"), new Configuration())
    fs
  }

  private[graft] def rowCount(path: String, conf: Configuration): Long = {
    try {
      val local = new java.io.File(path)
      val in =
        if (local.isFile) rawInputFile(sharedRawFs, path, local.length())
        else HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(path), conf)
      val reader = ParquetFileReader.open(in)
      try reader.getFooter.getBlocks.asScala.iterator.map(_.getRowCount).sum
      finally reader.close()
    } catch { case _: Exception => -1L }
  }

  /** Parquet InputFile over a raw (checksum-free) local FS with a known
    * length — avoids both the .crc side reads and the status call. */
  private def rawInputFile(fs: org.apache.hadoop.fs.FileSystem, path: String,
      len: Long): org.apache.parquet.io.InputFile =
    new org.apache.parquet.io.InputFile {
      override def getLength: Long = len
      override def newStream(): org.apache.parquet.io.SeekableInputStream =
        org.apache.parquet.hadoop.util.HadoopStreams.wrap(
          fs.open(new org.apache.hadoop.fs.Path(path)))
    }

  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         StringType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Aggregate row-group statistics to file-level bounds; a column whose
    * stats are missing/invalid in ANY row group is dropped entirely. */
  private def readFileStats(
      in: org.apache.parquet.io.InputFile,
      indexed: Map[String, DataType],
      rowCountShadowed: Boolean): String = {
    try {
      val reader = ParquetFileReader.open(in)
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        if (blocks.isEmpty) return ""
        var acc = Map.empty[String, (String, String, Long)] // (min, max, nulls)
        var bad = Set.empty[String]
        var totalRows = 0L
        blocks.foreach { b =>
          totalRows += b.getRowCount
          b.getColumns.asScala.foreach { c =>
            val name = c.getPath.toDotString
            indexed.get(name).foreach { dt =>
              val st = c.getStatistics
              val prim = c.getPrimitiveType.getPrimitiveTypeName
              val ann = c.getPrimitiveType.getLogicalTypeAnnotation
              if (st == null || st.isEmpty || st.getNumNulls < 0 ||
                  !encodingMatches(dt, prim, ann)) bad += name
              else {
                val (mn, mx) =
                  if (!st.hasNonNullValue) (null, null)
                  else (encodeValue(st.genericGetMin.asInstanceOf[AnyRef], prim,
                      ann, roundUp = false),
                    encodeValue(st.genericGetMax.asInstanceOf[AnyRef], prim,
                      ann, roundUp = true))
                if (mn == null && st.hasNonNullValue) bad += name
                else acc.get(name) match {
                  case None => acc += name -> (mn, mx, st.getNumNulls)
                  case Some((pmn, pmx, pn)) =>
                    acc += name -> (minOf(dt, pmn, mn), maxOf(dt, pmx, mx),
                      pn + st.getNumNulls)
                }
              }
            }
          }
        }
        val out = (acc -- bad).map { case (name, (mn, mx, nulls)) =>
          name -> ColStats(Option(mn), Option(mx), hn = nulls > 0,
            an = mn == null && nulls >= totalRows && totalRows > 0)
        }
        // exact footer row count under a reserved key (aggregate pushdown);
        // a real column of that name wins the key, so drop ours then
        val withRows =
          if (rowCountShadowed) out
          else out + (FileStats.RowCountKey ->
            ColStats(Some(totalRows.toString), None, hn = false, an = false))
        FileStats.encode(withRows)
      } finally reader.close()
    } catch { case _: Exception => "" } // stats are an optimization, never fail a write
  }

  /** The physical encoding must be one whose sort order maps onto our
    * string-encoded comparison domain. Timestamps are accepted in any
    * INT64 unit (MILLIS/MICROS/NANOS — normalized to micros at encode
    * time); INT96 has no usable stats and is rejected; a LongType column
    * must NOT carry a timestamp annotation (it would be unit-ambiguous). */
  private def encodingMatches(dt: DataType, p: PrimitiveTypeName,
      ann: LogicalTypeAnnotation): Boolean = (dt, p) match {
    case (ByteType | ShortType | IntegerType | DateType, PrimitiveTypeName.INT32) => true
    case (LongType, PrimitiveTypeName.INT64) =>
      !ann.isInstanceOf[LogicalTypeAnnotation.TimestampLogicalTypeAnnotation]
    case (TimestampType | TimestampNTZType, PrimitiveTypeName.INT64) =>
      ann.isInstanceOf[LogicalTypeAnnotation.TimestampLogicalTypeAnnotation]
    case (FloatType, PrimitiveTypeName.FLOAT) => true
    case (DoubleType, PrimitiveTypeName.DOUBLE) => true
    case (StringType, PrimitiveTypeName.BINARY) =>
      ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
    case _ => false
  }

  /** Encode a raw footer value into the comparison domain; timestamps
    * normalize to MICROS, with bound-safe rounding for nanos (min rounds
    * down, max rounds up, so the interval only ever widens). */
  private def encodeValue(v: AnyRef, p: PrimitiveTypeName,
      ann: LogicalTypeAnnotation, roundUp: Boolean): String = v match {
    case null => null
    case b: Binary if p == PrimitiveTypeName.BINARY => b.toStringUsingUTF8
    case n: java.lang.Long =>
      ann match {
        case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          val micros = ts.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MILLIS =>
              math.multiplyExact(n.longValue, 1000L)
            case LogicalTypeAnnotation.TimeUnit.MICROS => n.longValue
            case LogicalTypeAnnotation.TimeUnit.NANOS =>
              if (roundUp) Math.floorDiv(n.longValue + 999L, 1000L)
              else Math.floorDiv(n.longValue, 1000L)
          }
          micros.toString
        case _ => n.toString
      }
    case n => n.toString // Integer / Float / Double box toString
  }

  private def minOf(dt: DataType, a: String, b: String): String =
    if (a == null) b else if (b == null) a
    else if (StatsCompare.compare(dt, a, b) <= 0) a else b

  private def maxOf(dt: DataType, a: String, b: String): String =
    if (a == null) b else if (b == null) a
    else if (StatsCompare.compare(dt, a, b) >= 0) a else b
}

/** Comparison over the string-encoded stats domain. Strings compare as
  * unsigned UTF-8 bytes — the same total order Spark's UTF8String and
  * parquet's UTF8 column order use; floats/doubles via IEEE compare. */
object StatsCompare {
  def compare(dt: DataType, a: String, b: String): Int = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType =>
      java.lang.Long.compare(a.toLong, b.toLong)
    case FloatType | DoubleType => java.lang.Double.compare(a.toDouble, b.toDouble)
    case StringType => compareUtf8(a, b)
    case _ => throw new IllegalArgumentException(s"unsupported stats type $dt")
  }

  def compareUtf8(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
