package graft.sql

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}

import graft.functions.GraftFunctions
import graft.tables.{CompactionOptions, GraftTable}

/** Session extensions (the reference's LakeSoulSparkSessionExtension,
  * sql/LakeSoulSparkSessionExtension.scala:62-114 + the CALL-only SQL
  * extension parser, C13: LakeSoulSqlExtensions.g4:47-63,
  * LakeSoulSparkSqlExtensionsParser.scala):
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
  *
  * Adds:  CALL graft.<proc>(name => 'value', ...)  with procedures
  * compaction / rollback / vacuum / drop_partition, plus the graft scalar
  * function library in every session. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // SQL UPDATE / DELETE / MERGE INTO over graft DSv2 catalog tables
    e.injectPostHocResolutionRule(spark => GraftDmlRule(spark))
    // projection-embedded merge-operator selection: funName(col) in a
    // SELECT over a graft table -> per-scan merge-op option (M4)
    e.injectPostHocResolutionRule(spark => ExtractMergeOpProjection(spark))
    // transparent, freshness-gated materialized-view rewrite of matching
    // aggregates over graft catalog tables
    e.injectPostHocResolutionRule(spark => MviewRewriteRule(spark))
    // clear errors for unsupported v1 commands against graft tables (C16)
    e.injectCheckRule(spark => GraftUnsupportedOperationsCheck(spark))
  }
}

/** Delegating parser: intercepts `CALL graft.<proc>(...)`, hands everything
  * else to Spark's parser — the same delegation shape as the reference's
  * extension parser. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val CallRe =
    """(?is)\s*CALL\s+graft\.(\w+)\s*\((.*)\)\s*;?\s*""".r
  private val ArgRe = """(?s)\s*(\w+)\s*=>\s*'((?:[^']|'')*)'\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case CallRe(proc, argStr) =>
      val args = if (argStr.trim.isEmpty) Map.empty[String, String]
        else argStr.split(",(?=(?:[^']*'[^']*')*[^']*$)").map {
          case ArgRe(k, v) => k.toLowerCase -> v.replace("''", "'")
          case bad => throw new IllegalArgumentException(
            s"bad CALL argument '$bad' (expected name => 'value')")
        }.toMap
      GraftCallCommand(proc.toLowerCase, args)
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** `CALL graft.<proc>(...)` dispatch (reference: CallExecCommand.scala:14-185,
  * procedures rollback/compaction via rules/ProcessCall.scala). */
case class GraftCallCommand(proc: String, args: Map[String, String])
    extends LeafRunnableCommand {

  override lazy val output: Seq[Attribute] = DataTypeUtils.toAttributes(
    if (proc == "history")
      StructType(Seq(
        StructField("version", org.apache.spark.sql.types.IntegerType),
        StructField("commit_ts", org.apache.spark.sql.types.LongType),
        StructField("operation", StringType),
        StructField("partitions", org.apache.spark.sql.types.IntegerType),
        StructField("files_added", org.apache.spark.sql.types.IntegerType)))
    else if (proc == "validate")
      StructType(Seq(StructField("issue", StringType)))
    else if (proc == "diff") {
      // tabular change feed: the table's schema + _change_type (resolved
      // at analysis time from the named table); CDC tables' diff maps the
      // stored marker INTO _change_type and drops the marker column
      val ti = tableOf(org.apache.spark.sql.SparkSession.active).info
      StructType(graft.util.SchemaUtil.fromJson(ti.schemaJson)
        .filterNot(f => ti.cdcColumn.contains(f.name)))
        .add("_change_type", StringType)
    }
    else StructType(Seq(StructField("result", StringType))))

  private def tableOf(spark: SparkSession): GraftTable =
    (args.get("table_path"), args.get("table_name")) match {
      case (Some(p), _) => GraftTable.forPath(spark, p)
      case (_, Some(n)) => GraftTable.forName(spark, n)
      case _ => throw new IllegalArgumentException(
        s"CALL graft.$proc requires table_path or table_name")
    }

  override def run(spark: SparkSession): Seq[Row] = {
    GraftFunctions.register(spark)
    // the one procedure with a tabular result: the table-level commit log
    // (version numbers here are what VERSION AS OF accepts)
    if (proc == "history")
      return tableOf(spark).history.map {
        case (v, ts, op, nParts, nFiles) => Row(v, ts, op, nParts, nFiles)
      }
    // tabular row-level change feed between two timestamps (the SQL face
    // of GraftTable.diff — Delta's table_changes shape). CALL results
    // materialize on the driver; for bulk consumption use the DataFrame
    // form (readtype=diff) instead.
    // consistency check: one row per violation, empty result = healthy
    if (proc == "validate")
      return tableOf(spark)
        .validate(args.getOrElse("max_issues", "100").toInt).map(Row(_))
    if (proc == "diff") {
      val t = tableOf(spark)
      val from = args.get("from_ts").map(_.toLong).getOrElse(0L)
      // default upper bound = the newest COMMIT timestamp, not wall clock:
      // the store's monotonic stamps can run a few ms ahead of
      // currentTimeMillis under same-millisecond bursts, and a wall-clock
      // bound would silently exclude those commits
      val to = args.get("to_ts").map(_.toLong).getOrElse(t.lastCommitTs)
      // CALL results materialize on the driver, so the row count is HARD
      // bounded (default 10k, override via max_rows): an unbounded window
      // over a big table would OOM the driver. Bulk consumption belongs to
      // the DataFrame form (readtype=diff), which stays distributed.
      val maxRows = args.getOrElse("max_rows", "10000").toInt
      val rows = t.diff(from, to).limit(maxRows + 1).collect().toSeq
      require(rows.size <= maxRows,
        s"CALL graft.diff produced more than max_rows=$maxRows rows — a " +
          "CALL materializes its result on the driver; read the change " +
          "feed distributed instead (spark.read.format(\"graft\")" +
          ".option(\"readtype\", \"diff\") with readStartTime/readEndTime), " +
          "or raise max_rows explicitly")
      return rows
    }
    val result = proc match {
      case "compaction" =>
        val t = tableOf(spark)
        val opts = CompactionOptions(
          fileNumLimit = args.get("file_num_limit").map(_.toInt),
          fileSizeLimit = args.get("file_size_limit").map(_.toLong),
          newBucketNum = args.get("new_bucket_num").map(_.toInt))
        val pred: String => Boolean = args.get("partition_desc") match {
          case Some(d) => _ == d
          case None => _ => true
        }
        t.compaction(opts, pred); "compacted"
      case "rollback" =>
        val t = tableOf(spark)
        t.rollbackPartition(
          args.getOrElse("partition_desc", graft.meta.TableInfo.RootPartition),
          args("version").toInt)
        "rolled back"
      case "restore" =>
        // whole-table restore: version = 1-based table-level commit number
        // (CALL graft.history's numbering), or as_of_ts = epoch millis
        val t = tableOf(spark)
        val moved = args.get("version").map(v => t.restoreToVersion(v.toInt))
          .orElse(args.get("as_of_ts").map(ts => t.restoreToTimestamp(ts.toLong)))
          .getOrElse(throw new IllegalArgumentException(
            "graft.restore needs version or as_of_ts"))
        s"restored, ${moved.size} partition heads moved"
      case "vacuum" =>
        val n = tableOf(spark).vacuum(args.getOrElse("retain_ms", "0").toLong)
        s"deleted $n files"
      case "repair" =>
        // roll forward interrupted maintenance: an unfinished restore's
        // pending marker (writers blocked) or a crashed re-bucket's open
        // mapping marker (reads conservative) — see GraftTable.repair
        if (tableOf(spark).repair()) "repaired" else "nothing to repair"
      case "drop_partition" =>
        tableOf(spark).dropPartition(args("partition_desc")); "dropped"
      case "cluster" =>
        // re-cluster a non-PK table on sort columns (comma-separated) so
        // file min/max bounds make range predicates skip files
        tableOf(spark).cluster(
          args("columns").split(',').map(_.trim).filter(_.nonEmpty).toSeq,
          args.get("num_files").map(_.toInt).getOrElse(0),
          zorder = args.get("zorder").exists(_.toBoolean))
        "clustered"
      case "compact_meta" =>
        // bound the version log: keep history newer than retain_ms (default:
        // everything after the newest commit -> heads only), the reference's
        // cleanMetaUptoTime. Time travel before the boundary stops working.
        val t = tableOf(spark)
        val boundary = System.currentTimeMillis() -
          args.getOrElse("retain_ms", "0").toLong
        val dropped =
          graft.meta.MetaStore.default.compactVersionLog(t.tablePath, boundary)
        s"dropped $dropped log lines"
      case "clone" =>
        val c = tableOf(spark).cloneTo(args("target_path"),
          args.get("as_of_ts").map(_.toLong))
        s"cloned to ${c.tablePath}"
      case "create_mview" =>
        // measures => 'name:op:expr;name:op:expr' — expr is last so it may
        // itself contain colons (e.g. array/map syntax)
        val measures = args("measures").split(';').toSeq.map { m =>
          m.split(":", 3) match {
            case Array(n, op, e) =>
              graft.pipeline.MaterializedView.Measure(n, e, op)
            case _ => throw new IllegalArgumentException(
              s"bad measure '$m' (expected name:op:expr)")
          }
        }
        graft.pipeline.MaterializedView.create(spark,
          args("source_path"), args("view_path"),
          args("keys").split(',').map(_.trim).filter(_.nonEmpty).toSeq,
          measures,
          args.get("bucket_num").map(_.toInt).getOrElse(4),
          args.get("filter"))
        "created"
      case "refresh_mview" =>
        val v = graft.pipeline.MaterializedView.refresh(spark, args("view_path"))
        s"refreshed to ${v.info.properties(
          graft.pipeline.MaterializedView.CursorProp)}"
      case "enable_rewrite" =>
        graft.pipeline.MaterializedView.enableRewrite(spark, args("view_path"))
        "rewrite enabled"
      case "disable_rewrite" =>
        graft.pipeline.MaterializedView.disableRewrite(spark, args("view_path"))
        "rewrite disabled"
      case "expect" =>
        // data-quality expectation on future writes:
        // CALL graft.expect(table_path => '...', name => 'minlen',
        //   predicate => 'length(text) >= 3', action => 'quarantine')
        tableOf(spark).expect(args("name"), args("predicate"),
          args.getOrElse("action", "fail"))
        "expectation set"
      case "create_index" =>
        graft.tables.SecondaryIndex.create(spark,
          args("source_path"), args("index_path"), args("column"),
          args.get("bucket_num").map(_.toInt).getOrElse(32))
        "created"
      case "refresh_index" =>
        val i = graft.tables.SecondaryIndex.refresh(spark, args("index_path"))
        s"refreshed to ${i.info.properties(
          graft.tables.SecondaryIndex.CursorProp)}"
      case "replicate" =>
        // pull target up to date with source via the change feed
        // (GraftTable.replicateFrom: resumable cursor, initial backfill)
        val src = GraftTable.forPath(spark, args("source_path"))
        val cursor = GraftTable.forPath(spark, args("target_path"))
          .replicateFrom(src)
        s"replicated to $cursor"
      case other =>
        throw new IllegalArgumentException(s"unknown procedure graft.$other")
    }
    Seq(Row(result))
  }
}
