package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KLL quantile-sketch aggregates (Apache DataSketches) — the mergeable
  * state behind `approx_quantile` measures of
  * [[graft.pipeline.MaterializedView]]: approximate percentiles (doc
  * lengths, scores, latencies) maintained incrementally per group, where
  * exact percentiles would need the full value multiset per refresh.
  * Same architectural slot as Spark's own HllSketchAgg — a
  * TypedImperativeAggregate whose buffer is the sketch itself, serialized
  * only at shuffle boundaries. */
abstract class KllAggBase extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(KllAggBase.K)
  override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
    b.merge(o); b
  }
  override def eval(b: KllDoublesSketch): Any = b.toByteArray
  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

object KllAggBase {
  /** Sketch size/accuracy knob: k=200 gives ~1.65% rank error (the
    * DataSketches default). */
  val K = 200
}

/** `graft_kll_agg(DOUBLE) -> BINARY`: build a KLL sketch of the values
  * (nulls skipped). */
case class KllSketchAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KllAggBase {
  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[Double])
    b
  }
  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
  override def prettyName: String = "graft_kll_agg"
}

/** `graft_kll_merge(BINARY) -> BINARY`: union serialized KLL sketches
  * (nulls skipped) — the cross-run fold of `approx_quantile` measure
  * columns on the aggregate merge path. */
case class KllMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KllAggBase {
  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      b.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }
  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
  override def prettyName: String = "graft_kll_merge"
}

/** `graft_kll_quantile(sketch BINARY, q DOUBLE) -> DOUBLE`: the value at
  * rank `q` (0..1, INCLUSIVE criteria); NULL for an empty sketch.
  * Read-side only (one deserialize per group row, never a corpus-scale
  * hot path) — interpreted eval is deliberate: the nullable boxed result
  * doesn't fit nullSafeCodeGen's primitive contract and the row counts
  * here never justify codegen. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(sk: Any, q: Any): Any =
    KllKernels.quantile(sk.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "graft_kll_quantile"
}

/** Theta-sketch aggregate (Apache DataSketches): a mergeable DISTINCT-SET
  * summary supporting set algebra — union, intersection, difference — that
  * HLL cannot do. The buffer is a theta Union (accepts raw items AND other
  * sketches, so the same class serves update and merge). Items: integral
  * types update by value, strings by UTF-8 bytes. */
case class ThetaSketchAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[org.apache.datasketches.theta.Union]
    with UnaryLike[Expression] {
  import org.apache.datasketches.theta.{SetOperation, Sketch, Union}

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()
  override def update(b: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => b.update(v.asInstanceOf[Long])
      case IntegerType => b.update(v.asInstanceOf[Int].toLong)
      case ShortType => b.update(v.asInstanceOf[Short].toLong)
      case StringType => b.update(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      case other => throw new IllegalStateException(
        s"graft_theta_agg does not support $other")
    }
    b
  }
  override def merge(b: Union, o: Union): Union = { b.union(o.getResult); b }
  override def eval(b: Union): Any = b.getResult.toByteArray
  override def serialize(b: Union): Array[Byte] = b.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketch.heapify(Memory.wrap(bytes)))
    u
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
  override def prettyName: String = "graft_theta_agg"
}

/** `graft_theta_merge(BINARY) -> BINARY`: union serialized theta sketches
  * (nulls skipped) — the cross-run fold of `approx_set` measure columns
  * on the aggregate merge path. */
case class ThetaMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[org.apache.datasketches.theta.Union]
    with UnaryLike[Expression] {
  import org.apache.datasketches.theta.{SetOperation, Sketch, Union}

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()
  override def update(b: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      b.union(Sketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }
  override def merge(b: Union, o: Union): Union = { b.union(o.getResult); b }
  override def eval(b: Union): Any = b.getResult.toByteArray
  override def serialize(b: Union): Array[Byte] = b.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketch.heapify(Memory.wrap(bytes)))
    u
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaMergeAgg =
    copy(child = c)
  override def prettyName: String = "graft_theta_merge"
}

/** `graft_theta_estimate(sketch) -> DOUBLE`: estimated distinct count. */
case class ThetaEstimate(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(sk: Any): Any =
    ThetaKernels.estimate(sk.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_theta_estimate"
}

/** `graft_theta_intersect(a, b) -> BINARY`: sketch of the intersection —
  * the set-algebra step HLL lacks; chain with graft_theta_estimate for
  * overlap counts. Read-side only. */
case class ThetaIntersect(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaKernels.intersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "graft_theta_intersect"
}

/** `graft_theta_a_not_b(a, b) -> BINARY`: sketch of the set difference
  * A \ B — with intersect and union this completes the theta set algebra
  * (e.g. "documents only in source A"). Read-side only. */
case class ThetaANotB(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaKernels.aNotB(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "graft_theta_a_not_b"
}

/** `graft_theta_union_of(a, b) -> BINARY`: pairwise sketch union. */
case class ThetaUnionOf(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaKernels.union(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "graft_theta_union_of"
}

object ThetaKernels {
  import org.apache.datasketches.theta.{SetOperation, Sketch}

  def estimate(bytes: Array[Byte]): Double =
    Sketch.heapify(Memory.wrap(bytes)).getEstimate

  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(Sketch.heapify(Memory.wrap(a)))
    i.intersect(Sketch.heapify(Memory.wrap(b)))
    i.getResult.toByteArray
  }

  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketch.heapify(Memory.wrap(a)))
    u.union(Sketch.heapify(Memory.wrap(b)))
    u.getResult.toByteArray
  }

  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildANotB()
      .aNotB(Sketch.heapify(Memory.wrap(a)), Sketch.heapify(Memory.wrap(b)))
      .toByteArray
}

object KllKernels {
  def quantile(bytes: Array[Byte], q: Double): java.lang.Double = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) null
    else java.lang.Double.valueOf(
      sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE))
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val x = KllDoublesSketch.heapify(Memory.wrap(a))
    x.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
    x.toByteArray
  }
}
