package graft.pipeline

import java.net.{URLDecoder, URLEncoder}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.{CommitOp, TableInfo}
import graft.tables.GraftTable

/** Incrementally-maintained materialized aggregate views.
  *
  * A view is a primary-key graft table whose rows are the running aggregate
  * of `source.groupBy(keys)`, with each measure column carrying an
  * ASSOCIATIVE merge operator ([[graft.mergeop.MergeOps]]: `sum_all`,
  * `min_all`, `max_all`) as a table property. `refresh` reads ONLY the
  * source commits since the last refresh (the incremental read, SURVEY.md
  * §2.1 S10), partially aggregates that delta, and upserts one row per
  * touched key — the merge-on-read path (and compaction) folds partials
  * into totals. Nothing ever re-reads the full source: at 100 TB the
  * refresh cost is O(delta), the view read is O(groups), and compaction
  * keeps the per-key run count bounded. This is the reference's
  * merge-operator use-case (incremental aggregation without
  * read-modify-write; reference MergeOperator.scala:17-85,
  * merge_operator.rs:21-167) packaged as a view lifecycle.
  *
  * Source contract: INSERT-only facts — `append` (or PK upserts that only
  * ever insert new keys) plus compactions. A refresh that observes an
  * `update`/`rewrite`/`delete` commit in its window throws: those rewrite
  * history that the view has already folded in, so the delta is no longer
  * a consumable increment (same reason the reference's incremental read
  * aborts on update commits). CDC sources are rejected at creation.
  *
  * Refresh semantics: reads commits in `(cursor, latest]` where `latest` is
  * the newest source commit timestamp at refresh time, then advances the
  * cursor to `latest` — each commit is folded exactly once, and a crashed
  * refresh re-runs idempotently ONLY if its upsert did not commit (the
  * upsert and the cursor bump are two meta operations; a crash between
  * them double-folds that window on the next refresh — run refreshes from
  * one maintenance driver, like the reference's compaction service).
  *
  * Null semantics match SQL exactly: `sum` ignores NULL measure values
  * (NULL only for a group that never saw a non-null value), `count`
  * counts non-null evaluations (`count("1")` = COUNT(*)), `min`/`max`
  * ignore nulls like SQL MIN/MAX.
  */
object MaterializedView {
  val SourceProp = "graft.mview.source"
  val CursorProp = "graft.mview.cursor"
  val KeysProp = "graft.mview.keys"
  val MeasuresProp = "graft.mview.measures"
  val LastBatchProp = "graft.mview.lastbatch"
  val StreamIdProp = "graft.mview.stream"
  val FilterProp = "graft.mview.filter"
  val DimsProp = "graft.mview.dims"

  /** Optional int property: when a refresh leaves >= N partial runs in
    * some bucket, it triggers a view compaction — bounds merge-on-read
    * fan-in without an external scheduler (the reference's compaction
    * cadence, scoped to the view). */
  val AutoCompactProp = "graft.mview.autocompact"

  /** Marks a MUTABLE-source view (create(..., mutable = true)): refresh
    * folds the source's row-level change feed with signed weights, so
    * UPDATE/DELETE/overwriting-upsert commits maintain the view exactly
    * instead of throwing. */
  val MutableProp = "graft.mview.mutable"
  /** Hidden signed row count per group (mutable views): a group whose
    * rows were all deleted folds to 0 and vanishes from [[read]]. */
  val RowsCol = "_g_rows"
  /** Hidden signed non-null count per sum measure (mutable views):
    * restores SQL SUM's NULL-when-no-non-null-value at [[read]] (a sum
    * folded to 0 by deletes is indistinguishable from a true 0 without
    * it). */
  def nnCol(measure: String): String = s"_g_nn_$measure"

  /** A dimension joined onto each fact delta BEFORE filter/aggregation
    * (the star-schema rollup: revenue by nation without storing nation on
    * the fact). `usingCols` is an equi-join USING list; `joinType` is
    * `left` (keep facts with no dim row) or `inner`.
    *
    * Contract: the dimension is read AT REFRESH TIME — new facts see the
    * dim's current rows, but a later dim-row change is NOT retroactively
    * folded into already-refreshed aggregates (the standard streaming
    * star-join semantics; re-create the view for a dim rewrite). */
  final case class DimJoin(path: String, usingCols: Seq[String],
      joinType: String = "left") {
    require(Seq("left", "inner").contains(joinType),
      s"dim join type must be left|inner, got '$joinType'")
    require(usingCols.nonEmpty, "dim join needs at least one USING column")
  }

  /** One view measure: `name` (output column), `expr` (ANSI SQL over the
    * source schema), `op` in sum|count|min|max|approx_distinct.
    * `approx_distinct` maintains a mergeable HLL sketch (binary column,
    * [[graft.mergeop.MergeOps.HllUnion]]); [[read]] surfaces it as the
    * estimated distinct count — the only way COUNT(DISTINCT) can be kept
    * incrementally without re-scanning the source (exact distinct is not
    * associative; the sketch union is). `approx_freq` maintains a
    * count-min sketch of the expression's string values
    * ([[graft.mergeop.MergeOps.CmsMerge]]); query per-item estimates with
    * `GraftFunctions.cmsEstimate(col, item)` — approximate GROUP BY
    * key x item counts without key x item result cardinality. */
  final case class Measure(name: String, expr: String, op: String) {
    require(Set("sum", "count", "min", "max", "approx_distinct",
      "approx_freq", "approx_quantile", "approx_set")(op),
      s"unsupported measure op '$op' (sum|count|min|max|approx_distinct" +
        "|approx_freq|approx_quantile|approx_set)")

    private[MaterializedView] def partialAgg: Column = (op match {
      case "sum" => sum(expr_)
      case "count" => count(expr_).cast("long")
      case "min" => min(expr_)
      case "max" => max(expr_)
      case "approx_distinct" => hll_sketch_agg(expr_)
      // items are sketched by their STRING bytes so the read-side
      // graft_cms_estimate(sketch, item) matches by the same encoding
      case "approx_freq" => count_min_sketch(expr_.cast("string"),
        lit(0.001), lit(0.99), lit(42))
      // percentiles queried with graft_kll_quantile(col, q) on [[read]]
      case "approx_quantile" =>
        graft.functions.GraftFunctions.kllAgg(expr_.cast("double"))
      // theta sketch: distinct sets with read-time SET ALGEBRA
      // (graft_theta_intersect/_union_of + _estimate across group rows)
      case "approx_set" => graft.functions.GraftFunctions.thetaAgg(expr_)
    }).as(name)

    private def expr_ : Column = org.apache.spark.sql.functions.expr(expr)

    private[MaterializedView] def mergeOp: String = op match {
      case "sum" | "count" => "sum_not_null" // SQL SUM: nulls contribute nothing
      case "min" => "min_all"
      case "max" => "max_all"
      case "approx_distinct" => "hll_union"
      case "approx_freq" => "cms_merge"
      case "approx_quantile" => "kll_merge"
      case "approx_set" => "theta_union"
    }
  }

  /** Create an EMPTY view over `sourcePath` at `viewPath`; call [[refresh]]
    * to fold in the source's history (the initial refresh IS the backfill —
    * one incremental read over (0, latest]). The view is hash-partitioned
    * by `keys`, so point lookups bucket-prune and view reads are
    * shuffle-free bucket merges. */
  def create(
      spark: SparkSession,
      sourcePath: String,
      viewPath: String,
      keys: Seq[String],
      measures: Seq[Measure],
      bucketNum: Int = 4,
      filter: Option[String] = None,
      dims: Seq[DimJoin] = Nil,
      properties: Map[String, String] = Map.empty,
      mutable: Boolean = false): GraftTable = {
    graft.functions.GraftFunctions.register(spark) // sketch measure exprs
    require(keys.nonEmpty, "materialized view needs at least one group key")
    require(measures.nonEmpty, "materialized view needs at least one measure")
    val dup = (keys ++ measures.map(_.name)).groupBy(identity)
      .collect { case (n, vs) if vs.size > 1 => n }
    require(dup.isEmpty, s"duplicate view column(s): ${dup.mkString(", ")}")
    val src = GraftTable.forPath(spark, sourcePath)
    require(src.info.cdcColumn.isEmpty,
      "materialized views over CDC sources are not supported")
    if (mutable) {
      // the signed fold can only invert sum/count; min/max/sketches are
      // not subtractable (a deleted row may have held the min)
      val bad = measures.filterNot(m => Set("sum", "count")(m.op))
      require(bad.isEmpty,
        s"mutable views need invertible measures (sum|count); got " +
          bad.map(m => s"${m.name}:${m.op}").mkString(", "))
      require(src.info.hasPrimaryKey,
        "mutable views need a primary-key source (the change feed " +
          "reconstructs row changes on the PK)")
    }
    // view schema = the partial aggregate's schema (types come out of the
    // analyzer, so decimal widening etc. match what refresh will write);
    // the dim joins and filter are validated against the source here too
    val preAgg = applyFilter(applyDims(spark, src.toDF.limit(0), dims), filter)
    measures.filter(_.op == "approx_set").foreach { m =>
      // theta updates accept integral and string items only — fail at
      // create, not in the middle of the first refresh job
      val dt = preAgg.select(org.apache.spark.sql.functions.expr(m.expr))
        .schema.head.dataType
      require(Seq(org.apache.spark.sql.types.LongType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.StringType).contains(dt),
        s"approx_set measure '${m.name}' needs an integral or string " +
          s"expression (got $dt); cast explicitly if intended")
    }
    val viewSchema =
      if (mutable) partialSigned(preAgg.withColumn("_change_type",
        org.apache.spark.sql.functions.lit("insert")), keys, measures).schema
      else partial(preAgg, keys, measures).schema
    val hidden =
      if (mutable) RowsCol +: measures.collect { case Measure(n, _, "sum") => nnCol(n) }
      else Nil
    val props = properties ++ Map(
      SourceProp -> src.info.tablePath,
      CursorProp -> "0",
      KeysProp -> enc(keys),
      MeasuresProp -> enc(measures.flatMap(m => Seq(m.name, m.expr, m.op)))) ++
      filter.map(f => FilterProp -> f) ++
      (if (dims.isEmpty) Map.empty else Map(DimsProp ->
        enc(dims.flatMap(d => Seq(d.path, d.usingCols.mkString(";"), d.joinType))))) ++
      (if (mutable) Map(MutableProp -> "true") else Map.empty) ++
      measures.map(m => TableInfo.mergeOpProp(m.name) -> m.mergeOp) ++
      hidden.map(c => TableInfo.mergeOpProp(c) -> "sum_not_null")
    GraftTable.createEmpty(spark, viewSchema, viewPath,
      hashColumns = keys, bucketNum = bucketNum, properties = props)
  }

  /** Fold source commits in `(cursor, latest]` into the view; no-op when
    * the view is already current. Returns the view table. */
  def refresh(spark: SparkSession, viewPath: String): GraftTable = {
    graft.functions.GraftFunctions.register(spark)
    val v = GraftTable.forPath(spark, viewPath)
    val p = v.info.properties
    val sourcePath = p.getOrElse(SourceProp,
      throw new IllegalArgumentException(s"$viewPath is not a materialized view"))
    val cursor = p(CursorProp).toLong
    val keys = decodeKeys(p)
    val measures = decodeMeasures(p)
    require(!p.contains(StreamIdProp),
      s"$viewPath is stream-maintained (see maintainStream) — a batch " +
        "refresh would re-fold commits the stream already counted")
    val src = GraftTable.forPath(spark, sourcePath)
    val latest = src.partitions.map(_.timestamp).maxOption.getOrElse(cursor)
    if (latest <= cursor) return v
    if (p.get(MutableProp).contains("true")) {
      // MUTABLE view: fold the row-level change feed with signed weights —
      // ALWAYS via the zero-shuffle diff kernel (pruned to touched
      // partition/bucket pairs), exact for any commit mix. Deliberately no
      // "append-only window" O(delta) shortcut: on a PK table even an
      // Append commit can land an existing key (the MOR merge overwrites
      // at read), and folding it as a pure insert would silently
      // double-count — the exactness these views exist for wins over the
      // shortcut. Insert-only pipelines that can promise disjoint keys
      // should use the plain (immutable) view, which is O(delta).
      val changes = src.diff(cursor, latest)
      val delta = applyFilter(
        applyDims(spark, changes, decodeDims(p)), p.get(FilterProp))
      v.upsert(partialSigned(delta, keys, measures))
      v.setProperties(Map(CursorProp -> latest.toString))
      autoCompact(v)
      return v
    }
    val ops = src.commitOpsBetween(cursor, latest)
    val bad = ops -- Set(CommitOp.Append, CommitOp.Merge, CommitOp.Compaction)
    require(bad.isEmpty,
      s"source $sourcePath has non-incremental commit(s) ${bad.mkString(", ")} " +
        s"in ($cursor, $latest] — materialized views need insert-only sources")
    // a shallow clone's base snapshot is published as compaction/rewrite
    // commits the incremental reader refuses to treat as a delta — an
    // initial backfill that would silently fold NOTHING from a non-empty
    // source must fail loudly instead
    require(cursor > 0 || src.incrementalFiles(0L, latest).nonEmpty ||
      src.liveFiles.isEmpty,
      s"source $sourcePath has no incrementally-consumable history (e.g. " +
        "a shallow clone's base snapshot) — materialized views need " +
        "sources whose rows arrived as append/upsert commits")
    val delta = applyFilter(
      applyDims(spark, src.incremental(cursor, latest), decodeDims(p)),
      p.get(FilterProp))
    v.upsert(partial(delta, keys, measures))
    v.setProperties(Map(CursorProp -> latest.toString))
    autoCompact(v)
    v
  }

  /** Compact when any bucket's run count reaches the [[AutoCompactProp]]
    * threshold (no-op without the property). */
  private[graft] def autoCompact(v: GraftTable): Unit =
    v.info.properties.get(AutoCompactProp).map(_.toInt).foreach { n =>
      val runs = v.liveFiles.groupBy(f => (f.partitionDesc, f.file.bucketId))
        .values.map(_.map(_.commitOrdinal).distinct.size).maxOption.getOrElse(0)
      if (runs >= n) v.compaction()
    }

  /** CONTINUOUS maintenance: a Structured Streaming query over the source
    * graft table that folds every micro-batch into the view the same way
    * [[refresh]] folds a window — partial aggregate, merge-op upsert. The
    * stream starts from the view's batch cursor (so it composes with prior
    * [[refresh]] calls), and a micro-batch replayed after checkpoint
    * recovery is skipped by the recorded last-folded batch id — the
    * replay protection sums need that PK-upserts alone can't give. The
    * upsert and the batch-id bump are two meta operations (the same
    * window as [[refresh]]'s cursor bump and the streaming sink's
    * (queryId, batchId) record): a crash BETWEEN them re-folds that one
    * micro-batch on recovery — run one maintenance driver per view.
    *
    * Once streamed, the view is BOUND to that checkpoint: restarting from
    * the same checkpoint resumes; a different checkpoint (or a batch
    * [[refresh]]) would re-fold already-counted commits, so both are
    * rejected. This is the sink-side (queryId, batchId) idempotence
    * model of the reference's streaming sink (LakeSoulSink.scala:46-49)
    * applied to non-idempotent running totals. */
  def maintainStream(
      spark: SparkSession,
      viewPath: String,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val v = GraftTable.forPath(spark, viewPath)
    val p = v.info.properties
    val sourcePath = p.getOrElse(SourceProp,
      throw new IllegalArgumentException(s"$viewPath is not a materialized view"))
    val cursor = p(CursorProp).toLong
    val keys = decodeKeys(p)
    val measures = decodeMeasures(p)
    require(!p.get(MutableProp).contains("true"),
      "mutable views are batch-refresh only: the incremental stream " +
        "carries no preimages, so a micro-batch cannot invert updates — " +
        "run refresh() on a cadence instead")
    val streamId = md5(checkpoint)
    p.get(StreamIdProp) match {
      case Some(other) if other != streamId =>
        throw new IllegalStateException(s"$viewPath is already maintained by " +
          "a stream with a different checkpoint — a second pipeline would " +
          "re-fold commits the first already counted")
      case _ => // new binding recorded AFTER start() succeeds; same: resume
    }
    var reader = spark.readStream.format("graft")
    if (cursor > 0) reader = reader.option("readStartTime", cursor.toString)
    val query = reader.load(sourcePath).writeStream
      .queryName(s"graft-mview-${new java.io.File(viewPath).getName}")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.functions.GraftFunctions.register(batch.sparkSession)
        val view = GraftTable.forPath(batch.sparkSession, viewPath)
        // the batch-refresh guard, streamed: the source delivering a
        // window that contains an update/rewrite would silently DROP the
        // whole window's rows (incremental delivery aborts) — fail the
        // query loudly instead of advancing past lost data
        val srcT = GraftTable.forPath(batch.sparkSession, sourcePath)
        val bad = srcT.commitOpsBetween(cursor, Long.MaxValue) --
          Set(CommitOp.Append, CommitOp.Merge, CommitOp.Compaction)
        if (bad.nonEmpty) throw new IllegalStateException(
          s"source $sourcePath received non-incremental commit(s) " +
            s"${bad.mkString(", ")} — the stream-maintained view can no " +
            "longer fold a consumable delta; rebuild the view")
        val last = view.info.properties.get(LastBatchProp)
          .map(_.toLong).getOrElse(-1L)
        if (batchId > last) {
          view.upsert(partial(applyFilter(
            applyDims(batch.sparkSession, batch, decodeDims(p)),
            p.get(FilterProp)), keys, measures))
          view.setProperties(Map(LastBatchProp -> batchId.toString))
          autoCompact(view)
        }
      }
      .start()
    // bind only once the stream exists — a failed start() must not wedge
    // the view into rejecting all future maintenance
    v.setProperties(Map(StreamIdProp -> streamId))
    query
  }

  /** The current view contents (merge-on-read folds partial rows; after
    * compaction this is a plain scan of one row per key).
    * `approx_distinct` sketch columns are surfaced as their estimated
    * distinct counts; pass `estimate = false` to get the raw sketches
    * (e.g. to union views). */
  def read(spark: SparkSession, viewPath: String,
      estimate: Boolean = true): DataFrame = {
    val v = GraftTable.forPath(spark, viewPath)
    val p = v.info.properties
    var df = v.toDF
    if (p.get(MutableProp).contains("true")) {
      // groups whose rows were all deleted fold to 0 and vanish (SQL
      // GROUP BY shows no empty groups); a sum whose non-null
      // contributions all left reads NULL, not the 0 the fold left behind
      val sums = decodeMeasures(p).collect { case Measure(n, _, "sum") => n }
      df = sums.foldLeft(df.filter(col(RowsCol) =!= 0L))((d, n) =>
        d.withColumn(n, when(col(nnCol(n)) === 0L, lit(null)).otherwise(col(n))))
        .drop(RowsCol +: sums.map(nnCol): _*)
    }
    if (!estimate) df
    else p.get(MeasuresProp)
      .map(_ => decodeMeasures(p)
        .collect { case Measure(n, _, "approx_distinct") => n })
      .getOrElse(Nil)
      .foldLeft(df)((d, n) => d.withColumn(n, hll_sketch_estimate(col(n))))
  }

  /** Signed partial aggregate over change-feed rows (mutable views):
    * insert/update_postimage rows contribute their value, delete/
    * update_preimage rows its NEGATION (unary minus keeps the analyzed
    * type, so decimal partials match the view schema), plus the hidden
    * signed row / per-sum non-null counters [[read]] uses to restore
    * vanishing groups and SQL NULL-sum semantics. */
  private def partialSigned(delta: DataFrame, keys: Seq[String],
      measures: Seq[Measure]): DataFrame = {
    import org.apache.spark.sql.functions._
    val pos = col("_change_type").isin("insert", "update_postimage")
    def signed(e: Column): Column = when(pos, e).otherwise(-e)
    val w = when(pos, lit(1L)).otherwise(lit(-1L))
    val aggs = measures.map {
      case Measure(n, e, "sum") => sum(signed(expr(e))).as(n)
      case Measure(n, e, "count") =>
        sum(when(expr(e).isNotNull, w).otherwise(0L)).cast("long").as(n)
      case m => throw new IllegalStateException(
        s"non-invertible measure ${m.name}:${m.op} in a mutable view")
    } ++ measures.collect { case Measure(n, e, "sum") =>
      sum(when(expr(e).isNotNull, w).otherwise(0L)).cast("long").as(nnCol(n))
    } :+ sum(w).cast("long").as(RowsCol)
    delta.groupBy(keys.map(graft.util.SchemaUtil.qcol): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  private def partial(delta: DataFrame, keys: Seq[String],
      measures: Seq[Measure]): DataFrame = {
    // an all-null sum partial stays NULL: sum_not_null ignores it across
    // runs, so the view total matches SQL SUM exactly (NULL only when the
    // group never saw a non-null value)
    val aggs = measures.map(_.partialAgg)
    delta.groupBy(keys.map(graft.util.SchemaUtil.qcol): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  // ------------------------------------------------ transparent rewrite
  // registry consumed by graft.sql.MviewRewriteRule: canonical source
  // path -> view paths whose aggregates may answer queries over it

  private val rewriteViews =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.ConcurrentLinkedQueue[String]]()

  /** Allow [[graft.sql.MviewRewriteRule]] to answer matching aggregates
    * over this view's source from the view (freshness-gated — a lagging
    * view is skipped, never served stale). */
  def enableRewrite(spark: SparkSession, viewPath: String): Unit = {
    val v = GraftTable.forPath(spark, viewPath)
    require(!v.info.properties.get(MutableProp).contains("true"),
      "transparent rewrite over mutable views is not supported (the " +
        "rewrite rule reads raw view rows; mutable views need the " +
        "zero-group/null-sum adjustments MaterializedView.read applies)")
    val source = v.info.properties.getOrElse(SourceProp,
      throw new IllegalArgumentException(s"$viewPath is not a materialized view"))
    val q = rewriteViews.computeIfAbsent(source,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[String]())
    if (!q.contains(v.info.tablePath)) q.add(v.info.tablePath)
  }

  def disableRewrite(spark: SparkSession, viewPath: String): Unit = {
    val tp = GraftTable.forPath(spark, viewPath).info.tablePath
    rewriteViews.values().forEach(q => { q.remove(tp); () })
  }

  private[graft] def rewriteEnabled: Boolean = !rewriteViews.isEmpty

  private[graft] def rewriteCandidates(sourcePath: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Option(rewriteViews.get(sourcePath)).map(_.asScala.toSeq).getOrElse(Nil)
  }

  private[graft] def decodeKeys(props: Map[String, String]): Seq[String] =
    dec(props(KeysProp))

  private[graft] def decodeMeasures(props: Map[String, String]): Seq[Measure] =
    dec(props(MeasuresProp)).grouped(3)
      .map { case Seq(n, e, o) => Measure(n, e, o) }.toSeq

  private def applyFilter(df: DataFrame, filter: Option[String]): DataFrame =
    filter.fold(df)(f => df.where(org.apache.spark.sql.functions.expr(f)))

  /** Join the fact delta to each dimension. Dims are typically broadcast-
    * sized (Catalyst broadcasts them under the threshold automatically);
    * refresh cost stays O(delta + dims), never O(fact history). */
  private def applyDims(spark: SparkSession, df: DataFrame,
      dims: Seq[DimJoin]): DataFrame =
    dims.foldLeft(df)((d, j) =>
      d.join(GraftTable.forPath(spark, j.path).toDF, j.usingCols, j.joinType))

  private[graft] def decodeDims(props: Map[String, String]): Seq[DimJoin] =
    props.get(DimsProp).map(dec).map(_.grouped(3).map {
      case Seq(path, cols, jt) =>
        DimJoin(path, cols.split(';').toSeq.filter(_.nonEmpty), jt)
    }.toSeq).getOrElse(Nil)

  private def md5(s: String): String =
    graft.util.HashUtil.md5Hex(s).take(12)

  private def enc(parts: Seq[String]): String =
    parts.map(URLEncoder.encode(_, "UTF-8")).mkString(",")

  private def dec(s: String): Seq[String] =
    if (s.isEmpty) Nil
    else s.split(",", -1).toSeq.map(URLDecoder.decode(_, "UTF-8"))
}
