package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.streaming.GraftSink
import graft.tables.GraftTable

/** `format("graft")` — the reference's DataSource surface (SURVEY.md §3.1,
  * §3.3; sources/LakeSoulDataSource.scala):
  *
  *   spark.read.format("graft").load(path)            // batch read
  *     .option("readtype", "snapshot"|"incremental"|"diff")  // time travel / CDF
  *     .option("readendtime", <ms>) .option("readstarttime", <ms>)
  *     .option("partitiondesc", "k=v")                // partition pruning
  *   df.write.format("graft")                         // batch write
  *     .option("hashPartitions", "id").option("hashBucketNum", "4")
  *     .option("rangePartitions", "date")
  *     .mode("append"|"overwrite").save(path)         // append=upsert on PK
  *   spark.readStream.format("graft").load(path)      // incremental source
  *   df.writeStream.format("graft")                   // exactly-once sink
  *     .option("path", path).option("queryId", "q1")
  *
  * Option names mirror the reference (LakeSoulDataSource.scala:121-148).
  */
class GraftDataSource extends RelationProvider with CreatableRelationProvider
    with StreamSourceProvider with StreamSinkProvider
    with SchemaRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    graft.util.PathUtil.local(parameters.getOrElse("path",
      throw new IllegalArgumentException("'path' option (or load(path)) required")))

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    GraftRelation(sqlContext, pathOf(parameters), parameters)

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      schema: StructType): BaseRelation =
    createRelation(sqlContext, parameters)

  /** Batch write: creates the table on first write (bucketing options),
    * then append (non-PK) / upsert (PK) / overwrite. */
  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val path = pathOf(parameters)
    val spark = sqlContext.sparkSession
    // DSv1 `.partitionBy(cols)` arrives encoded under Spark's
    // __partition_columns option — the reference treats it as the range
    // spec, with an explicit rangePartitions option taking priority when
    // both are given (schema/CaseSensitivitySuite.scala:90-111)
    val byPartitionBy = parameters
      .get(org.apache.spark.sql.execution.datasources.DataSourceUtils
        .PARTITIONING_COLUMNS_KEY)
      .map(org.apache.spark.sql.execution.datasources.DataSourceUtils
        .decodePartitioningColumns)
      .getOrElse(Nil)
    if (!GraftTable.exists(path)) {
      val byOption = parameters.get("rangePartitions").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      val range = if (byOption.nonEmpty) byOption else byPartitionBy
      val hash = parameters.get("hashPartitions").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      val buckets = parameters.getOrElse("hashBucketNum", "4").toInt
      val props = parameters.view.filterKeys(_.startsWith("graft.")).toMap
      GraftTable.create(spark, data, path, range, hash, buckets, props)
    } else {
      val t0 = GraftTable.forPath(spark, path)
      // a partitionBy against an EXISTING table must name its range spec —
      // resolved case-insensitively like every partition option (the
      // reference's option resolution is mode-independent); a different
      // layout fails loudly instead of silently writing rows the table's
      // partition pruning would file under the wrong scheme
      if (byPartitionBy.nonEmpty) {
        val canon = t0.info.rangeColumns
        require(byPartitionBy.length == canon.length &&
          byPartitionBy.zip(canon).forall { case (r, c) => r.equalsIgnoreCase(c) },
          s"partitionBy(${byPartitionBy.mkString(",")}) does not match the " +
            s"table's range columns (${canon.mkString(",")}) at $path")
      }
      // .option("mergeSchema", true|false): per-write override of the
      // additive-schema-merge gate (reference MERGE_SCHEMA_OPTION)
      val t = parameters.get("mergeSchema")
        .map(v => t0.withMergeSchema(v.toBoolean)).getOrElse(t0)
      mode match {
        case SaveMode.Append =>
          if (t.info.hasPrimaryKey) t.upsert(data) else t.append(data)
        // .option("replaceWhere", "<predicate over range columns>"):
        // partition-targeted overwrite — only matching partitions replaced
        case SaveMode.Overwrite => parameters.get("replaceWhere") match {
          case Some(cond) =>
            t.overwriteWhere(data, org.apache.spark.sql.functions.expr(cond))
          case None => t.overwrite(data)
        }
        case SaveMode.Ignore => ()
        case SaveMode.ErrorIfExists =>
          throw new IllegalStateException(s"graft table already exists at $path")
      }
    }
    GraftRelation(sqlContext, path, parameters)
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val t = GraftTable.forPath(sqlContext.sparkSession, pathOf(parameters))
    val s = if (parameters.get("readtype").contains("diff")) {
      val cdc = t.info.cdcColumn.getOrElse(throw new IllegalArgumentException(
        "streaming readtype=diff needs a CDC table (the stored marker makes " +
          "each micro-batch O(delta)); a non-CDC PK table would pay a full " +
          "two-snapshot comparison per trigger — use batch diff() instead"))
      StructType(t.schema.filterNot(_.name == cdc))
        .add("_change_type", org.apache.spark.sql.types.StringType)
    } else t.schema
    (shortName(), s)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new GraftStreamSource(sqlContext.sparkSession, pathOf(parameters), parameters)

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink =
    new GraftStreamSink(sqlContext.sparkSession, pathOf(parameters),
      parameters, outputMode)
}

/** Batch relation with column pruning; Spark re-applies filters above us, so
  * pushdown is best-effort (partition pruning via `partitiondesc` option). */
case class GraftRelation(
    sqlContext: SQLContext,
    path: String,
    parameters: Map[String, String]) extends BaseRelation with PrunedFilteredScan {

  private def spark: SparkSession = sqlContext.sparkSession
  private def table: GraftTable = GraftTable.forPath(spark, path)

  override lazy val schema: StructType =
    if (parameters.get("readtype").contains("diff")) {
      // CDF shape: table columns (CDC marker consumed into the change type)
      // + _change_type — matches GraftTable.diff's output
      val t = table
      val base = t.info.cdcColumn match {
        case Some(cdc) => StructType(t.schema.filterNot(_.name == cdc))
        case None => t.schema
      }
      base.add("_change_type", org.apache.spark.sql.types.StringType)
    } else table.schema

  /** Live-file byte sum (scaled by the parquet compression factor) so the
    * join planner can auto-broadcast small graft tables instead of assuming
    * `defaultSizeInBytes` (the DSv1 default, effectively infinite). */
  // lazy: resolved once per relation. sizeInBytes is an ESTIMATE (Spark
  // uses it for broadcast decisions), so on partition-heavy tables it is
  // computed from a deterministic sample of partitions instead of resolving
  // every partition's commit files (1M partitions cold = 1M small meta
  // reads for a number that only needs to be order-of-magnitude right).
  override lazy val sizeInBytes: Long = {
    val t = table
    val heads = t.partitions
    val s =
      if (heads.size <= 2048) t.liveFiles.map(_.file.size).sum
      else {
        val step = math.max(1, heads.size / 1024)
        val sample = heads.indices.by(step).map(i => heads(i).partitionDesc)
        val sampled = t.liveFilesForDescs(sample).map(_.file.size).sum
        (sampled.toDouble * heads.size / sample.size).toLong
      }
    if (s == 0) 1L
    else (s * spark.sessionState.conf.fileCompressionFactor).toLong
  }

  private def baseDF(filters: Array[Filter],
      requiredColumns: Array[String]): DataFrame = {
    val t = table
    val ti = t.info
    // three-tier partition pruning (F4): explicit partitiondesc option, or
    // range-column equality/IN/ordering filters pushed down by Catalyst
    val rangeSets = graft.util.Filters.rangeValueSets(filters.toSeq, ti.rangeColumns)
    val isStr = (c: String) => t.schema.fields.find(_.name == c)
      .exists(_.dataType == org.apache.spark.sql.types.StringType)
    val ordPred = graft.util.Filters.rangeOrderingPred(
      filters.toSeq, ti.rangeColumns, isStr)
    val partPred: String => Boolean = parameters.get("partitiondesc") match {
      case Some(desc) => _ == desc
      case None =>
        val setPred = graft.util.Filters.partitionPredSets(rangeSets)
        d => setPred(d) && ordPred(d)
    }
    // fully-pinned partitions (explicit desc option, or equality/IN filters
    // covering every range column) resolve by META POINT LOOKUP — never a
    // full head listing (F4 fast path at 100k+ partitions)
    val exactDescs: Option[Seq[String]] = parameters.get("partitiondesc") match {
      case Some(desc) => Some(Seq(desc))
      case None => graft.util.Filters.exactDescs(rangeSets, ti.rangeColumns)
        .map(_.filter(ordPred))
    }
    parameters.getOrElse("readtype", "full") match {
      case "snapshot" => exactDescs match {
        case Some(ds) =>
          t.snapshotAtForDescs(parameters("readendtime").toLong, ds)
        case None => t.snapshotAt(parameters("readendtime").toLong, partPred)
      }
      case "incremental" =>
        val st = parameters.getOrElse("readstarttime", "0").toLong
        val et = parameters.get("readendtime").map(_.toLong)
          .getOrElse(t.lastCommitTs)
        exactDescs match {
          case Some(ds) => t.incrementalForDescs(st, et, ds)
          case None => t.incremental(st, et, partPred)
        }
      case "diff" =>
        // row-level change feed (full rows + _change_type) over
        // (readstarttime, readendtime]; see GraftTable.diff
        t.diff(parameters.getOrElse("readstarttime", "0").toLong,
          parameters.get("readendtime").map(_.toLong)
            .getOrElse(t.lastCommitTs))
      case _ =>
        // PK-equality on every hash column -> bucket-pruned point read (M6)
        val eq = filters.collect { case EqualTo(a, v) => a -> v }.toMap
        if (ti.hasPrimaryKey && ti.hashColumns.nonEmpty
            && ti.hashColumns.forall(eq.contains))
          t.lookupByPk(ti.hashColumns.map(eq))
        else {
          // column pruning (F1) + metadata file skipping on the pushed
          // filters (min/max bounds; merge-safe inside)
          val req = if (requiredColumns.nonEmpty
              && requiredColumns.length < t.schema.length)
            Some(requiredColumns.toSeq) else None
          exactDescs match {
            case Some(ds) => t.toDFWithFiltersForDescs(ds, req, filters.toSeq)
            case None => t.toDFWithFilters(partPred, req, filters.toSeq)
          }
        }
    }
  }

  /** Best-effort Filter -> Column translation so pushed data predicates are
    * applied BELOW the RDD boundary, where Catalyst can sink them into the
    * parquet scans (rowgroup/page pruning — F3). Untranslatable filters are
    * skipped; Spark re-applies every filter above the relation anyway. */
  private def filterToColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case And(l, r) =>
      for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc && rc
    case Or(l, r) =>
      for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc || rc
    case Not(c) => filterToColumn(c).map(!_)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case _ => None
  }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val df = baseDF(filters, requiredColumns)
    val filtered = filters.flatMap(filterToColumn).foldLeft(df)(_ filter _)
    val pruned =
      if (requiredColumns.isEmpty) filtered
      else filtered.select(requiredColumns.map(col).toIndexedSeq: _*)
    pruned.rdd
  }
}

/** Incremental micro-batch source (S10): offsets are commit timestamps; each
  * batch reads the (start, end] incremental file set
  * (MergeParquetScan.scala:342-374). */
class GraftStreamSource(
    spark: SparkSession,
    path: String,
    parameters: Map[String, String]) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def table: GraftTable = GraftTable.forPath(spark, path)
  private val startTime = parameters.getOrElse("readstarttime", "0").toLong
  // streaming change feed (CDC tables only — validated in sourceSchema):
  // each micro-batch is the O(delta) diff of its offset range
  private val diffMode = parameters.get("readtype").contains("diff")

  // admission control (same semantics as the DSv2 stream): pace deep
  // backlogs by whole-commit budgets instead of one giant first batch.
  // Implemented on the v2 mixins (a v1 Source IS a SparkDataStream, the
  // same route Spark's own file/Kafka v1 sources take) so it composes
  // with Trigger.AvailableNow natively — the v1 wrapper would otherwise
  // freeze the FIRST paced offset as the terminal one and stop early.
  import graft.streaming.StreamPacing
  private val maxCommits = StreamPacing.intOption(parameters, "maxCommitsPerTrigger")
  private val maxFiles = StreamPacing.longOption(parameters, "maxFilesPerTrigger")
  private val maxBytes = StreamPacing.longOption(parameters, "maxBytesPerTrigger")
  // newest offset handed to the engine; getBatch re-seeds it from the
  // checkpoint on restart (Spark replays the last batch first)
  @volatile private var handedOut: Long = startTime
  @volatile private var availableNowCap: Option[Long] = None

  override def schema: StructType =
    if (diffMode) {
      val t = table
      StructType(t.schema.filterNot(f => t.info.cdcColumn.contains(f.name)))
        .add("_change_type", org.apache.spark.sql.types.StringType)
    } else table.schema

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(table.lastCommitTs)

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit = {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    maxFiles.map(n => ReadLimit.maxFiles(n.toInt))
      .getOrElse(ReadLimit.allAvailable())
  }

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val newest = availableNowCap.getOrElse(table.lastCommitTs)
    if (newest <= 0L) return null // nothing committed yet
    val s = math.max(handedOut,
      Option(start).map(_.json.trim.toLong).getOrElse(startTime))
    // cut candidate windows at re-bucket flip boundaries: each side is
    // then mapping-consistent, so the batch reads bucket-parallel under
    // its own mapping instead of paying the cursor-split shuffle (or, for
    // diff mode, the per-partition bucket-merged pairing) — matters for a
    // catch-up batch after a restart from a pre-re-bucket checkpoint
    def clamp(cand: Long): Long =
      graft.meta.RebucketLog.clampAtFlip(table.info.properties, s, cand)
    if (newest <= s || StreamPacing.unpaced(maxCommits, maxFiles, maxBytes)) {
      val end = clamp(math.max(s, newest))
      handedOut = math.max(handedOut, end)
      return LongOffset(end)
    }
    val batches = table.commitBatches(s, newest,
      StreamPacing.boundaryCap(maxCommits, maxFiles))
    val end = clamp(if (batches.isEmpty) newest
      else StreamPacing.boundedEnd(batches, s, maxCommits, maxFiles, maxBytes))
    handedOut = end
    LongOffset(end)
  }

  override def getOffset: Option[Offset] = {
    // legacy entry point — only reached when admission control is not
    // consulted; keep the unpaced contract
    val ts = table.lastCommitTs
    if (ts <= 0L) None else Some(LongOffset(ts))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val s = start.map(o => offsetValue(o)).getOrElse(startTime)
    val e = offsetValue(end)
    if (e > handedOut) handedOut = e
    // strict: fail loudly (with re-pin guidance) when a RESTORE/overwrite
    // landed inside the stream's window — see NonIncrementalWindowException
    val batch = if (diffMode) table.diff(s, e, strict = true)
      else table.incremental(s, e, strict = true)
    org.apache.spark.sql.graft.StreamShim.asStreaming(batch)
  }

  private def offsetValue(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.toLong
  }

  override def stop(): Unit = ()
}

/** Streaming sink (S11) — exactly-once via (queryId, batchId) bookkeeping. */
class GraftStreamSink(
    spark: SparkSession,
    path: String,
    parameters: Map[String, String],
    outputMode: OutputMode) extends Sink {

  private val queryId = parameters.getOrElse("queryId", "graft-stream")

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // DSv1 hands us a streaming DF; re-plan it as a batch DF without
    // collecting to the driver
    val batch = org.apache.spark.sql.graft.StreamShim.asBatch(data)
    if (!GraftTable.exists(path)) {
      val range = parameters.get("rangePartitions").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      val hash = parameters.get("hashPartitions").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      val buckets = parameters.getOrElse("hashBucketNum", "4").toInt
      GraftTable.create(spark, batch, path, range, hash, buckets)
      graft.meta.MetaStore.default.recordBatchId(
        GraftTable.forPath(spark, path).tablePath, queryId, batchId)
    } else {
      val mode =
        if (outputMode == OutputMode.Complete()) "complete"
        else if (outputMode == OutputMode.Update()) "update"
        else "append"
      val t = GraftTable.forPath(spark, path)
      val m = if (mode == "append" && t.info.hasPrimaryKey) "update" else mode
      new GraftSink(t, queryId, m).addBatch(batchId, batch)
    }
  }
}
