package graft.mergeop

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Column merge operators (SURVEY.md §2.2 M2/M3; reference:
  * rust/lakesoul-io/src/physical_plan/merge/sorted/merge_operator.rs:21-167
  * and v2/merge/parquet/batch/merge_operator/MergeOperator.scala:17-85).
  *
  * Semantics: all rows sharing a primary key (within one range partition)
  * collapse to one row; each non-key column is combined by its operator over
  * the values ordered by write version. Expressed here as Spark aggregate
  * expressions over a `(versionExpr, value)` pair, which makes every operator
  * codegen-friendly (no UDFs) and associative — the same operator is applied
  * within a batch at write time (dedup-on-write) and across sorted runs at
  * read time, which is what makes the two-level application correct.
  *
  * Null semantics match the reference (merge_operator.rs:489-532):
  *   - use_last keeps a later explicit NULL (overwrites with null);
  *   - use_last_not_null scans back to the newest non-null value;
  *   - sum_all yields NULL if ANY contributing value is NULL;
  *   - joined_all concatenates non-null values in version order.
  */
/** Open for user extension (M3; reference MergeOperator.scala:17-85 lets
  * users implement `MergeOperator[T]` and register it by name): implement
  * `name`/`agg` with Column expressions and call [[MergeOps.register]].
  * Registered ops are applied through the aggregate merge path; the
  * shuffle-free bucket k-way merge handles the builtins and falls back
  * automatically for custom ops. */
trait MergeOp extends Serializable {
  def name: String

  /** Aggregate expression producing the merged value of `value` ACROSS
    * sorted runs (one row per key per run, thanks to dedup-on-write).
    * `version` orders writes (newer = larger); rows where the column was
    * physically absent from the source file pass `present=false` (schema
    * evolution: absent != explicit null, MergeParquetScan.scala:211-257). */
  def agg(value: Column, version: Column, present: Column, dt: DataType): Column

  /** Operator applied WITHIN one write batch (dedup-on-write). Defaults to
    * the cross-run operator (associative ops); the "last"-family overrides
    * this with last-writer-wins so e.g. `sum_last` sums the LAST value per
    * run instead of every value ever written (merge_operator.rs:535-600). */
  def intraBatchAgg(value: Column, version: Column, present: Column,
      dt: DataType): Column = agg(value, version, present, dt)
}

/** Optional ROW-LEVEL form of a custom operator: implement this alongside
  * `agg` and the shuffle-free bucket k-way merge applies the operator inside
  * the merge iterator instead of falling back to the aggregate (shuffling)
  * path. `combine` folds the newer run's PRESENT value into the accumulator
  * (the first present value seeds the accumulator); either side may be an
  * explicit null. Values are Catalyst INTERNAL representations (UTF8String
  * for strings, etc.) and the newer value is already safe to retain. */
trait RowMergeOp extends MergeOp {
  def combine(acc: Any, newer: Any): Any
}

object MergeOps {
  /** Default: last writer wins (among files containing the column).
    * Reference: `UseLast` / DefaultMergeOp. */
  case object UseLast extends MergeOp {
    val name = "use_last"
    def agg(value: Column, version: Column, present: Column, dt: DataType): Column =
      // max_by ignores rows whose ordering key is null, so absent-column
      // rows never win; the carried value may be any type (maps included)
      // and an explicit NULL at the newest version correctly overwrites.
      max_by(value, when(present, version))
  }

  /** Last non-null writer wins. Reference: `UseLastNotNull`. */
  case object UseLastNotNull extends MergeOp {
    val name = "use_last_not_null"
    def agg(value: Column, version: Column, present: Column, dt: DataType): Column =
      max_by(value, when(present && value.isNotNull, version))
  }

  /** Sum of all values; NULL if any contributing value is NULL.
    * Reference: `SumAll` / MergeOpInt / MergeOpLong. */
  case object SumAll extends MergeOp {
    val name = "sum_all"
    def agg(value: Column, version: Column, present: Column, dt: DataType): Column =
      when(max(when(present && value.isNull, 1).otherwise(0)) === 1,
        lit(null).cast(dt))
        .otherwise(sum(when(present, value)).cast(dt))
  }

  /** Non-null values concatenated in version order. Reference:
    * `JoinedAllByComma` / `JoinedAllBySemicolon` / MergeOpString. */
  final case class JoinedAll(sep: String) extends MergeOp {
    val name = if (sep == ",") "joined_all_by_comma" else s"joined_all_by_$sep"
    def agg(value: Column, version: Column, present: Column, dt: DataType): Column = {
      val pairs = collect_list(
        when(present && value.isNotNull, struct(version.as("v"), value.cast("string").as("c"))))
      array_join(transform(array_sort(pairs), _.getField("c")), sep)
    }
  }

  /** Sum of each run's LAST value (null poisons) — reference `SumLast`
    * (merge_operator.rs:27,293-380,535-600): within a write batch only the
    * last write survives; across runs those survivors are summed. */
  case object SumLast extends MergeOp {
    val name = "sum_last"
    def agg(value: Column, version: Column, present: Column, dt: DataType): Column =
      SumAll.agg(value, version, present, dt)
    override def intraBatchAgg(value: Column, version: Column, present: Column,
        dt: DataType): Column = UseLast.agg(value, version, present, dt)
  }

  /** Sum over all NON-NULL values ever written — SQL `SUM` semantics
    * (nulls ignored; NULL only if every contributing value is null),
    * unlike [[SumAll]]'s reference null-poisoning rule. The combiner
    * behind `sum`/`count` measures of
    * [[graft.pipeline.MaterializedView]], so view totals agree exactly
    * with the SQL aggregate they materialize (including the all-null
    * group, which reports NULL — not 0, and not poison). */
  case object SumNotNull extends MergeOp {
    val name = "sum_not_null"
    def agg(value: Column, version: Column, present: Column, dt: DataType): Column =
      sum(when(present, value)).cast(dt)
  }

  /** Minimum over all non-null values ever written (SQL `MIN` semantics:
    * nulls are ignored, NULL only if every contributing value is null).
    * Beyond the reference's operator set — the associative combiner that
    * makes MIN-measures of [[graft.pipeline.MaterializedView]] foldable
    * across sorted runs and through compaction. */
  case object MinAll extends MergeOp {
    val name = "min_all"
    def agg(value: Column, version: Column, present: Column, dt: DataType): Column =
      min(when(present, value))
  }

  /** Maximum over all non-null values ever written (SQL `MAX` semantics).
    * See [[MinAll]]. */
  case object MaxAll extends MergeOp {
    val name = "max_all"
    def agg(value: Column, version: Column, present: Column, dt: DataType): Column =
      max(when(present, value))
  }

  /** HyperLogLog-sketch union over BINARY sketch columns (the mergeable
    * state behind approximate COUNT(DISTINCT) measures of
    * [[graft.pipeline.MaterializedView]]): each run holds a serialized
    * Apache DataSketches HLL sketch (`hll_sketch_agg`); merging unions the
    * sketches — commutative, associative, idempotent per distinct item, so
    * refreshes, bucket merges, and compactions can fold in any order.
    * Runs inside the shuffle-free k-way merge (RowMergeOp) and through the
    * aggregate path (`hll_union_agg`). */
  case object HllUnion extends RowMergeOp {
    val name = "hll_union"
    def agg(value: Column, version: Column, present: Column, dt: DataType): Column =
      hll_union_agg(when(present, value), lit(true))
    def combine(acc: Any, newer: Any): Any =
      if (acc == null) newer
      else if (newer == null) acc
      else {
        import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
        val u = new Union(HllSketch.DEFAULT_LG_K)
        u.update(HllSketch.heapify(acc.asInstanceOf[Array[Byte]]))
        u.update(HllSketch.heapify(newer.asInstanceOf[Array[Byte]]))
        u.getResult(TgtHllType.HLL_8).toCompactByteArray
      }
  }

  /** Count-min-sketch union over BINARY sketch columns (the mergeable
    * state behind approximate per-item frequency measures of
    * [[graft.pipeline.MaterializedView]]): each run holds a serialized
    * Spark `CountMinSketch` (`count_min_sketch`); merging adds the count
    * tables cell-wise — commutative and associative, so any fold order
    * yields the same sketch. Runs inside the shuffle-free k-way merge
    * (RowMergeOp); the aggregate path unions through a typed UDAF (only
    * reached when a sibling column forces the fallback). */
  case object CmsMerge extends RowMergeOp {
    val name = "cms_merge"
    @transient private lazy val unionUdaf =
      org.apache.spark.sql.functions.udaf(
        new org.apache.spark.sql.expressions.Aggregator[
            Array[Byte], Array[Byte], Array[Byte]] {
          def zero: Array[Byte] = null
          private def m(a: Array[Byte], b: Array[Byte]) =
            if (a == null) b else if (b == null) a
            else graft.functions.Kernels.cmsMerge(a, b)
          def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] = m(buf, in)
          def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = m(b1, b2)
          def finish(buf: Array[Byte]): Array[Byte] = buf
          def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
            org.apache.spark.sql.Encoders.BINARY
          def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
            org.apache.spark.sql.Encoders.BINARY
        }, org.apache.spark.sql.Encoders.BINARY)
    def agg(value: Column, version: Column, present: Column, dt: DataType): Column =
      unionUdaf(when(present, value))
    def combine(acc: Any, newer: Any): Any =
      if (acc == null) newer
      else if (newer == null) acc
      else graft.functions.Kernels.cmsMerge(
        acc.asInstanceOf[Array[Byte]], newer.asInstanceOf[Array[Byte]])
  }

  /** Theta-sketch union over BINARY sketch columns — like [[HllUnion]]
    * but the folded state supports SET ALGEBRA at read time
    * (`graft_theta_intersect` / `graft_theta_union_of` +
    * `graft_theta_estimate`): distinct-set measures whose pairwise
    * overlaps stay queryable across groups. */
  case object ThetaUnion extends RowMergeOp {
    val name = "theta_union"
    def agg(value: Column, version: Column, present: Column, dt: DataType): Column = {
      import org.apache.spark.sql.graft.StreamShim
      StreamShim.columnOf(graft.functions.ThetaMergeAgg(
        StreamShim.expressionOf(when(present, value)))
        .toAggregateExpression())
    }
    def combine(acc: Any, newer: Any): Any =
      if (acc == null) newer
      else if (newer == null) acc
      else graft.functions.ThetaKernels.union(
        acc.asInstanceOf[Array[Byte]], newer.asInstanceOf[Array[Byte]])
  }

  /** Sorted-set union over `ARRAY<BIGINT>` columns — the posting-list
    * combiner behind [[graft.tables.SecondaryIndex]]: each run holds the
    * SORTED DISTINCT pk list contributed by one refresh; merging is a
    * sorted merge-walk with dedup (associative, idempotent), so index
    * rows fold correctly through upserts and compaction. Inputs must be
    * sorted distinct (the index's partial aggregation guarantees it). */
  case object SetUnionLongs extends RowMergeOp {
    val name = "set_union_longs"
    def agg(value: Column, version: Column, present: Column, dt: DataType): Column =
      array_sort(array_distinct(flatten(collect_list(when(present, value)))))
    def combine(acc: Any, newer: Any): Any = {
      import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
      if (acc == null) return newer
      if (newer == null) return acc
      val a = acc.asInstanceOf[ArrayData].toLongArray()
      val b = newer.asInstanceOf[ArrayData].toLongArray()
      val out = new Array[Long](a.length + b.length)
      var i = 0; var j = 0; var n = 0
      while (i < a.length || j < b.length) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { i += 1; a(i - 1) }
          else { j += 1; b(j - 1) }
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, n))
    }
  }

  /** KLL quantile-sketch union over BINARY sketch columns (the mergeable
    * state behind `approx_quantile` measures of
    * [[graft.pipeline.MaterializedView]]): merging is the sketch's own
    * `merge` — associative with bounded rank error, so percentiles stay
    * queryable after any fold order. Fast path via RowMergeOp; aggregate
    * path via the `graft_kll_merge` TypedImperativeAggregate. */
  case object KllMerge extends RowMergeOp {
    val name = "kll_merge"
    def agg(value: Column, version: Column, present: Column, dt: DataType): Column = {
      import org.apache.spark.sql.graft.StreamShim
      StreamShim.columnOf(graft.functions.KllMergeAgg(
        StreamShim.expressionOf(when(present, value)))
        .toAggregateExpression())
    }
    def combine(acc: Any, newer: Any): Any =
      if (acc == null) newer
      else if (newer == null) acc
      else graft.functions.KllKernels.merge(
        acc.asInstanceOf[Array[Byte]], newer.asInstanceOf[Array[Byte]])
  }

  /** Each run's LAST value, non-nulls concatenated in version order —
    * reference `JoinedLastByComma` / `JoinedLastBySemicolon`
    * (merge_operator.rs:28-29,84-96). */
  final case class JoinedLast(sep: String) extends MergeOp {
    val name = if (sep == ",") "joined_last_by_comma"
      else if (sep == ";") "joined_last_by_semicolon"
      else s"joined_last_by_$sep"
    def agg(value: Column, version: Column, present: Column, dt: DataType): Column =
      JoinedAll(sep).agg(value, version, present, dt)
    override def intraBatchAgg(value: Column, version: Column, present: Column,
        dt: DataType): Column = UseLast.agg(value, version, present, dt)
  }

  val builtins: Map[String, MergeOp] = Seq(
    UseLast, UseLastNotNull, SumAll, SumLast, SumNotNull, MinAll, MaxAll,
    HllUnion, CmsMerge, KllMerge, SetUnionLongs, ThetaUnion,
    JoinedAll(","), JoinedAll(";"), JoinedLast(","), JoinedLast(";"))
    .map(op => op.name -> op).toMap

  private val registered =
    new java.util.concurrent.ConcurrentHashMap[String, MergeOp]()

  /** User extension point (M3): make a custom operator resolvable from the
    * `graft.mergeop.<col>` table property / per-read overrides. */
  def register(op: MergeOp): Unit = registered.put(op.name, op)

  /** Register by fully-qualified class name under an explicit function name
    * (reference `LakeSoulTable.registerMergeOperator`,
    * LakeSoulTable.scala:761-766): the class must be a no-arg [[MergeOp]]
    * implementation; `funName` overrides its self-declared name, so one
    * class can be mounted under several names. */
  def register(funName: String, className: String): Unit = {
    val op = Class.forName(className).getDeclaredConstructor()
      .newInstance() match {
      case m: MergeOp => m
      case other => throw new IllegalArgumentException(
        s"$className is not a graft.mergeop.MergeOp (got ${other.getClass})")
    }
    val mounted: MergeOp = op match {
      case r: RowMergeOp => new RowMergeOp {
        val name = funName
        def agg(value: Column, version: Column, present: Column, dt: DataType): Column =
          r.agg(value, version, present, dt)
        override def intraBatchAgg(value: Column, version: Column,
            present: Column, dt: DataType): Column =
          r.intraBatchAgg(value, version, present, dt)
        def combine(acc: Any, newer: Any): Any = r.combine(acc, newer)
      }
      case m => new MergeOp {
        val name = funName
        def agg(value: Column, version: Column, present: Column, dt: DataType): Column =
          m.agg(value, version, present, dt)
        override def intraBatchAgg(value: Column, version: Column,
            present: Column, dt: DataType): Column =
          m.intraBatchAgg(value, version, present, dt)
      }
    }
    registered.put(funName, mounted)
  }

  def forName(name: String): MergeOp =
    builtins.getOrElse(name, {
      val custom = registered.get(name)
      if (custom != null) custom
      else throw new IllegalArgumentException(
        s"unknown merge operator '$name' (known: ${
          (builtins.keys ++ registered.keySet.asScala).mkString(", ")})")
    })

  /** Projection-embedded SQL surface (M4; reference users register their
    * merge-op UDFs and write `funName(col)` in a SELECT —
    * ExtractMergeOperator.scala:20-88): registers every currently-known
    * operator whose name is a legal SQL identifier as a marker function, so
    * `SELECT sum_all(v) FROM graft_cat.ns.t` selects the operator for that
    * read. The markers are stripped into scan options at analysis time by
    * [[graft.sql.ExtractMergeOpProjection]]; `graft_merge_op(col, 'name')`
    * is the always-registered generic form. */
  def registerSqlFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    val ident = "[A-Za-z_][A-Za-z0-9_]*".r
    (builtins.keys ++ registered.keySet.asScala).foreach {
      case name @ ident() =>
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(name,
          es => graft.functions.MergeOpMarker(es.head, name), "built-in")
      case _ => // names with separators (e.g. "joined_all(;)") stay API-only
    }
  }
}
