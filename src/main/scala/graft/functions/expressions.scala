package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Static kernels shared by interpreted eval and generated code — each
  * expression's doGenCode emits a single static call, so the expressions stay
  * inside whole-stage codegen without inline-string bloat. */
object Kernels {
  /** popcount(xor) over two long arrays (binary embeddings).
    * Reference semantics: lakesoul/functions/HammingDistFunc.scala:7-51. */
  def hamming(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var acc = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1
    }
    acc
  }

  /** Overlap count of two SORTED long arrays — one allocation-free merge
    * walk. The Jaccard-verify hot loop: |A∩B| with |A∪B| derived as
    * |A|+|B|-|A∩B|, so one pass replaces an array_intersect + array_union
    * pair (each of which builds a hash set per call). Inputs must be
    * sorted ascending and duplicate-free (set semantics). */
  def sortedOverlap(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var acc = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { acc += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    acc
  }

  /** cosine similarity of two float vectors. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var dot = 0.0; var na = 0.0; var nb = 0.0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var acc = 0.0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  /** cosine of a row vector against a plain float array (centroid). */
  def cosineFA(a: ArrayData, b: Array[Float]): Double = {
    val n = math.min(a.numElements(), b.length)
    var i = 0; var dot = 0.0; var na = 0.0; var nb = 0.0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** 1-bit residual quantization code: bit i set iff v[i] >= cent[i],
    * packed little-endian into 64-bit words (the sign of the residual
    * v - cent — the heart of RaBitQ-style binary quantization). */
  def residualSignBits(v: ArrayData, cent: Array[Float]): ArrayData = {
    val n = math.min(v.numElements(), cent.length)
    val words = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (v.getFloat(i) >= cent(i)) words(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(words)
  }

  /** Driver-side twin of [[residualSignBits]] for the query vector. */
  def residualSignBitsLocal(v: Array[Float], cent: Array[Float]): Array[Long] = {
    val n = math.min(v.length, cent.length)
    val words = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (v(i) >= cent(i)) words(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    words
  }

  /** 64-bit SimHash over string tokens: per token a 64-bit hash votes +1/-1
    * on each bit position; the sign vector is the fingerprint. */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = xx64(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L; var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of md5(bytes) as a big-endian long — the SQL-replayable
    * 64-bit hash: DuckDB's `('0x' || substring(md5(t), 1, 16))::UBIGINT`
    * yields the identical bit pattern (md5 hex strings match across
    * engines; hex is big-endian byte order). */
  def md5Hash64(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) | ((h(2) & 0xffL) << 40) |
      ((h(3) & 0xffL) << 32) | ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
  }

  /** [[simhash]] with the md5-derived per-token hash — bit-identical to a
    * DuckDB replay (per-token UBIGINT from the md5 hex prefix, +1/-1 bit
    * votes, sign). Used by oracled queries; the xx64 form stays the fast
    * production default. */
  def simhashMd5(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = md5Hash64(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L; var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** MinHash signature: one strong hash per shingle + `num` cheap avalanche
    * mixes (the standard one-hash/k-mix trick) — a single pass over the
    * array instead of `num` re-hashes of every string. */
  def minhash(shingles: ArrayData, num: Int): ArrayData = {
    val mins = Array.fill(num)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = xx64(shingles.getUTF8String(i).getBytes)
        var k = 0
        while (k < num) {
          val g = mix64(base + 0x9e3779b97f4a7c15L * (k + 1))
          if (g < mins(k)) mins(k) = g
          k += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** One-pass MinHash signature DIRECTLY from text: tokenize on ASCII
    * whitespace (lowercasing inline), hash each token, combine k-token
    * windows with a mixed rolling combiner, and track `num` minima via the
    * one-hash/k-mix trick — zero intermediate strings or arrays beyond the
    * token-hash buffer. Replaces a 4-deep interpreted higher-order-function
    * chain (split/filter/transform/slice/concat) that allocated ~|tokens|
    * shingle strings per row and dominated dedup wall-clock. */
  def minhashText(text: org.apache.spark.unsafe.types.UTF8String,
      k: Int, num: Int): ArrayData = {
    val bytes = text.getBytes
    var tokenHashes = new Array[Long](64)
    var n = 0
    var h = 0xcbf29ce484222325L
    var inTok = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val ws = b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'
      if (ws) {
        if (inTok) {
          if (n == tokenHashes.length) {
            val t = new Array[Long](n * 2)
            System.arraycopy(tokenHashes, 0, t, 0, n); tokenHashes = t
          }
          tokenHashes(n) = h; n += 1; h = 0xcbf29ce484222325L; inTok = false
        }
      } else {
        // ASCII lowercase inline; other bytes pass through
        val lb = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        h ^= (lb & 0xffL); h *= 0x100000001b3L
        inTok = true
      }
      i += 1
    }
    if (inTok) {
      if (n == tokenHashes.length) {
        val t = new Array[Long](n * 2)
        System.arraycopy(tokenHashes, 0, t, 0, n); tokenHashes = t
      }
      tokenHashes(n) = h; n += 1
    }
    val mins = Array.fill(num)(Long.MaxValue)
    val windows = if (n <= k) 1 else n - k + 1
    val width = math.min(k, math.max(n, 1))
    var w = 0
    while (w < windows) {
      var base = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < width && w + j < n) {
        base = mix64(base ^ tokenHashes(w + j)); j += 1
      }
      var kk = 0
      while (kk < num) {
        val g = mix64(base + 0x9e3779b97f4a7c15L * (kk + 1))
        if (g < mins(kk)) mins(kk) = g
        kk += 1
      }
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  def mix64(z0: Long): Long = {
    var z = z0
    z ^= z >>> 33; z *= 0xff51afd7ed558ccdL; z ^= z >>> 33
    z *= 0xc4ceb9fe1a85ec53L; z ^= z >>> 33
    z
  }

  /** xxHash64-style mix (stable across JVMs; NOT the reference's hash — any
    * stable 64-bit hash works for fingerprints). */
  def xx64(bytes: Array[Byte]): Long = {
    // FNV-1a 64 then avalanche — deterministic, allocation-free
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L; h ^= h >>> 33
    h
  }

  /** Union two serialized Spark CountMinSketches (same eps/confidence/seed
    * by construction — all partials of one view measure share the literal
    * parameters). */
  def cmsMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val x = org.apache.spark.util.sketch.CountMinSketch.readFrom(a)
    x.mergeInPlace(org.apache.spark.util.sketch.CountMinSketch.readFrom(b))
    x.toByteArray
  }

  /** Estimated count of `item` (matched by UTF-8 bytes) in a serialized
    * CountMinSketch. */
  def cmsEstimate(sketch: Array[Byte],
      item: org.apache.spark.unsafe.types.UTF8String): Long =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(sketch)
      .estimateCount(item.getBytes)
}

/** `graft_hamming(Array[Long], Array[Long]) -> Int` — popcount of xor, the
  * reference's binary-embedding distance (HammingDistFunc.scala:7-51,
  * registered via catalog loadFunction, LakeSoulCatalog.scala:587-604). */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.hamming(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Kernels.hamming($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "graft_hamming"
}

/** `graft_cosine(Array[Float], Array[Float]) -> Double`. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Kernels.cosine($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "graft_cosine"
}

/** `graft_dot(Array[Float], Array[Float]) -> Double`. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Kernels.dot($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "graft_dot"
}

/** `graft_simhash(Array[String]) -> Long` — 64-bit SimHash fingerprint. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Kernels.simhash(v.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Kernels.simhash($v);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_simhash"
}

/** `graft_simhash_md5(Array[String]) -> Long` — SimHash with the
  * md5-derived per-token hash (SQL-replayable; see [[Kernels.simhashMd5]]). */
case class SimHash64Md5(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Kernels.simhashMd5(v.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Kernels.simhashMd5($v);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_simhash_md5"
}

/** Analysis-time marker for projection-embedded merge-operator selection
  * (M4; reference rules/ExtractMergeOperator.scala:20-88 extracts marker
  * UDFs from the projection): `graft_merge_op(col, 'op')` — or the sugar
  * `<op>(col)` after [[graft.mergeop.MergeOps.registerSqlFunctions]] — is a
  * type-preserving no-op that [[graft.sql.ExtractMergeOpProjection]] strips
  * into scan options. Reaching eval means the projection was NOT over a
  * graft relation; fail with the reference's clear error
  * (NonMergeOperatorUDFCheck). */
case class MergeOpMarker(child: Expression, opName: String)
    extends UnaryExpression {
  graft.mergeop.MergeOps.forName(opName) // unknown operator fails at analysis
  override def dataType: DataType = child.dataType
  override lazy val foldable: Boolean = false
  private def unsupported: Nothing = throw new UnsupportedOperationException(
    s"merge operator '$opName' can only be used in a SELECT over a graft table")
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    unsupported
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    unsupported
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_merge_op"
}

object MergeOpMarker {
  /** Function-registry builder: second argument must be a string literal. */
  def fromArgs(es: Seq[Expression]): Expression = es match {
    case Seq(value, Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType)) =>
      MergeOpMarker(value, s.toString)
    case _ => throw new IllegalArgumentException(
      "graft_merge_op(col, 'operator_name') expects a string-literal operator name")
  }
}

/** `graft_xx64(String) -> Long` — stable 64-bit content hash. */
case class Hash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Kernels.xx64(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Kernels.xx64($v.getBytes());")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_xx64"
}

/** `graft_minhash(Array[String], n) -> Array[Long]` — n-function MinHash
  * signature in one pass over the shingle array. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.minhash(v.asInstanceOf[ArrayData], numHashes)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Kernels.minhash($v, $numHashes);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_minhash"
}

/** `graft_nearest_cell(vec Array[Float], cells Array[Long],
  * cvecs Array[Array[Float]]) -> Long` — the cell id of the centroid with
  * max cosine similarity to `vec` (first wins ties). `cells`/`cvecs` are
  * foldable literals, decoded once per executor — so the whole IVF
  * assignment step is ONE map-side codegen'd expression: zero shuffles,
  * zero broadcast-join row amplification, zero extra jobs. Reference
  * semantics: coarse quantization in rust/lakesoul-vector (IVF-RaBitQ). */
case class NearestCentroid(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType

  @transient private lazy val cells: Array[Long] =
    second.eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val cvecs: Array[Array[Float]] = {
    val a = third.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(i => a.getArray(i).toFloatArray())
  }

  def nearest(v: ArrayData): Long = {
    var best = 0; var bestSim = Double.NegativeInfinity
    var i = 0
    while (i < cvecs.length) {
      val s = Kernels.cosineFA(v, cvecs(i))
      if (s > bestSim) { bestSim = s; best = i }
      i += 1
    }
    cells(best)
  }

  override def nullSafeEval(v: Any, c: Any, cv: Any): Any =
    nearest(v.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroid", this)
    nullSafeCodeGen(ctx, ev, (v, _, _) => s"${ev.value} = $ref.nearest($v);")
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression) = copy(f, s, t)
  override def prettyName: String = "graft_nearest_cell"
}

/** `graft_nearest_cells(vec, cells, cvecs, n) -> Array[Long]`: the `n` cell
  * ids whose centroids are nearest to `vec` (cosine desc, centroid-rank asc
  * tie-break — the same order [[NearestCentroid]] and
  * `Similarity.probeCells` use). The per-QUERY-row side of an IVF KNN join:
  * one codegen'd map pass tags each query with its probe cells. */
case class NearestCells(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val cells: Array[Long] =
    second.eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val cvecs: Array[Array[Float]] = {
    val a = third.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(i => a.getArray(i).toFloatArray())
  }
  @transient private lazy val n: Int =
    fourth.eval(null).asInstanceOf[Int]

  def nearestN(v: ArrayData): ArrayData = {
    val m = math.min(n, cvecs.length)
    val sims = Array.tabulate(cvecs.length)(i => Kernels.cosineFA(v, cvecs(i)))
    // selection of the top-m by (sim desc, rank asc): m is tiny (nprobe),
    // so m passes over nlist beat building a heap
    val taken = new Array[Boolean](cvecs.length)
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var best = -1; var bestSim = Double.NegativeInfinity
      var i = 0
      while (i < cvecs.length) {
        if (!taken(i) && sims(i) > bestSim) { bestSim = sims(i); best = i }
        i += 1
      }
      taken(best) = true; out(j) = cells(best); j += 1
    }
    ArrayData.toArrayData(out)
  }

  override def nullSafeEval(v: Any, c: Any, cv: Any, nn: Any): Any =
    nearestN(v.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this)
    nullSafeCodeGen(ctx, ev, (v, _, _, _) => s"${ev.value} = $ref.nearestN($v);")
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression) =
    copy(f, s, t, q)
  override def prettyName: String = "graft_nearest_cells"
}

/** `graft_residual_code(vec, cell, cells, cvecs) -> Array[Long]`: the 1-bit
  * residual-sign quantization code of `vec` against its assigned cell's
  * centroid (bit i = vec[i] >= centroid[i], packed into 64-bit words) —
  * the IVF-RaBitQ code step (reference
  * rust/lakesoul-vector/src/rabitq/quantizer.rs) reduced to its sign bits
  * and expressed as one codegen'd map pass. */
case class ResidualSignCode(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val centByCell: java.util.HashMap[Long, Array[Float]] = {
    val cellsArr = third.eval(null).asInstanceOf[ArrayData].toLongArray()
    val a = fourth.eval(null).asInstanceOf[ArrayData]
    val m = new java.util.HashMap[Long, Array[Float]](cellsArr.length * 2)
    var i = 0
    while (i < cellsArr.length) {
      m.put(cellsArr(i), a.getArray(i).toFloatArray()); i += 1
    }
    m
  }

  def code(v: ArrayData, cell: Long): ArrayData = {
    val cent = centByCell.get(cell)
    require(cent != null, s"unknown cell id $cell")
    Kernels.residualSignBits(v, cent)
  }

  override def nullSafeEval(v: Any, c: Any, ce: Any, cv: Any): Any =
    code(v.asInstanceOf[ArrayData], c.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("residualCode", this)
    nullSafeCodeGen(ctx, ev, (v, c, _, _) => s"${ev.value} = $ref.code($v, $c);")
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression) =
    copy(f, s, t, q)
  override def prettyName: String = "graft_residual_code"
}

/** `graft_residual_norm(vec, cell, cells, cvecs) -> Double`: the L2 norm of
  * the residual `vec - centroid(cell)` — the per-vector scalar an IVF-BQ
  * code stores next to its sign bits (RaBitQ keeps the same factor,
  * quantizer.rs) so query time can reconstruct an estimated distance from
  * 1-bit codes. */
case class ResidualNorm(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = DoubleType

  @transient private lazy val centByCell: java.util.HashMap[Long, Array[Float]] = {
    val cellsArr = third.eval(null).asInstanceOf[ArrayData].toLongArray()
    val a = fourth.eval(null).asInstanceOf[ArrayData]
    val m = new java.util.HashMap[Long, Array[Float]](cellsArr.length * 2)
    var i = 0
    while (i < cellsArr.length) {
      m.put(cellsArr(i), a.getArray(i).toFloatArray()); i += 1
    }
    m
  }

  def rnorm(v: ArrayData, cell: Long): Double = {
    val cent = centByCell.get(cell)
    val n = math.min(v.numElements(), cent.length)
    var i = 0; var acc = 0.0
    while (i < n) {
      val d = v.getFloat(i).toDouble - cent(i).toDouble
      acc += d * d; i += 1
    }
    math.sqrt(acc)
  }

  override def nullSafeEval(v: Any, c: Any, ce: Any, cv: Any): Any =
    rnorm(v.asInstanceOf[ArrayData], c.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("residualNorm", this)
    nullSafeCodeGen(ctx, ev, (v, c, _, _) => s"${ev.value} = $ref.rnorm($v, $c);")
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression) =
    copy(f, s, t, q)
  override def prettyName: String = "graft_residual_norm"
}

/** `graft_bit_dot(code, q) -> Double`: asymmetric code-times-float product
  * `sum_i (code bit i ? +q[i] : -q[i])` — the query side of the IVF-BQ
  * distance estimate: the query stays float, the corpus row is 1 bit/dim. */
case class BitDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  @transient private lazy val q: Array[Float] =
    right.eval(null).asInstanceOf[ArrayData].toFloatArray()

  def bitDot(code: ArrayData): Double = {
    // Bounds-safe under ragged dims (no out-of-range word reads); the
    // packed form cannot distinguish a true 0-bit from final-word padding,
    // so dims are a corpus-wide constant by operator contract (as in any
    // vector index) — a genuinely shorter row would see its padding bits
    // scored as -q(i).
    val n = math.min(q.length, code.numElements() << 6)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val bit = (code.getLong(i >>> 6) >>> (i & 63)) & 1L
      acc += (if (bit == 1L) q(i).toDouble else -q(i).toDouble)
      i += 1
    }
    acc
  }

  override def nullSafeEval(c: Any, qq: Any): Any =
    bitDot(c.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bitDot", this)
    nullSafeCodeGen(ctx, ev, (c, _) => s"${ev.value} = $ref.bitDot($c);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "graft_bit_dot"
}

/** `graft_minhash_text(String) -> Array[Long]` — text-to-signature MinHash
  * in ONE kernel pass (tokenize + k-shingle + 32-way minima); see
  * Kernels.minhashText. */
case class MinHashText(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.minhashText(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, numHashes)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Kernels.minhashText($v, $k, $numHashes);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "graft_minhash_text"
}

/** `graft_sorted_overlap(a Array[Long], b Array[Long]) -> Int` — overlap
  * count of two sorted duplicate-free long arrays via [[Kernels.sortedOverlap]]. */
case class SortedOverlap(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.sortedOverlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Kernels.sortedOverlap($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "graft_sorted_overlap"
}

/** `graft_prefix_order(hashes Array[Long], demoted Array[Long]) ->
  * Array[Long]` — the AllPairs global-order sort for prefix filtering:
  * input hashes sorted by (demotion rank asc, hash asc), where `demoted`
  * lists corpus-common tokens most-frequent-FIRST and absent tokens rank
  * 0. Rare tokens therefore sort to the prefix in hash order; the most
  * frequent token lands at the very end. `demoted` is a foldable literal
  * decoded ONCE into a hash map per expression instance — a literal-map
  * `element_at` does a linear scan per lookup, which at corpus scale is
  * O(|shingles| * |demoted|) and dominates the whole join. */
case class PrefixOrder(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_prefix_order demoted list must be a foldable literal " +
          "(it is decoded once into the per-instance rank map)")
    else super.checkInputDataTypes()

  @transient private lazy val rank: java.util.HashMap[java.lang.Long, Integer] = {
    val a = right.eval(null).asInstanceOf[ArrayData].toLongArray()
    val m = new java.util.HashMap[java.lang.Long, Integer](a.length * 2)
    var i = 0
    while (i < a.length) { m.put(a(i), a.length - i); i += 1 }
    m
  }

  def reorder(v: ArrayData): ArrayData = {
    val in = v.toLongArray()
    val keyed = new Array[(Int, Long)](in.length)
    var i = 0
    while (i < in.length) {
      val r = rank.get(in(i))
      keyed(i) = (if (r == null) 0 else r.intValue(), in(i))
      i += 1
    }
    java.util.Arrays.sort(keyed, Ordering.Tuple2[Int, Long])
    val out = new Array[Long](in.length)
    i = 0
    while (i < in.length) { out(i) = keyed(i)._2; i += 1 }
    ArrayData.toArrayData(out)
  }

  override def nullSafeEval(v: Any, d: Any): Any =
    reorder(v.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("prefixOrder", this)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $ref.reorder($v);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "graft_prefix_order"
}

/** `graft_cms_estimate(sketch BINARY, item STRING) -> BIGINT`: estimated
  * count of `item` in a serialized Spark `CountMinSketch` (the state behind
  * the `approx_freq` measures of [[graft.pipeline.MaterializedView]]).
  * Items are matched by their UTF-8 bytes — the same encoding
  * `count_min_sketch` over a string column updates with, so estimates line
  * up with the aggregate. Read-side only (one deserialize per group row,
  * not a corpus-scale hot path). */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(sk: Any, item: Any): Any =
    Kernels.cmsEstimate(sk.asInstanceOf[Array[Byte]],
      item.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Kernels.cmsEstimate($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "graft_cms_estimate"
}

/** Registration + Column helpers. Registered once per session into the
  * function registry (the Spark-4 equivalent of the reference's catalog
  * `loadFunction`, SparkFunctions.scala:7-14), then invoked with
  * `call_function` so the Column API needs no private constructors. */
object GraftFunctions {
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    ("graft_hamming", es => HammingDistance(es(0), es(1))),
    ("graft_cosine", es => CosineSimilarity(es(0), es(1))),
    ("graft_dot", es => DotProduct(es(0), es(1))),
    ("graft_simhash", es => SimHash64(es.head)),
    ("graft_simhash_md5", es => SimHash64Md5(es.head)),
    ("graft_merge_op", es => MergeOpMarker.fromArgs(es)),
    ("graft_minhash32", es => MinHashSignature(es.head, 32)),
    ("graft_xx64", es => Hash64(es.head)),
    ("graft_minhash_text3_32", es => MinHashText(es.head, 3, 32)),
    ("graft_nearest_cell", es => NearestCentroid(es(0), es(1), es(2))),
    ("graft_nearest_cells", es => NearestCells(es(0), es(1), es(2), es(3))),
    ("graft_residual_code", es => ResidualSignCode(es(0), es(1), es(2), es(3))),
    ("graft_residual_norm", es => ResidualNorm(es(0), es(1), es(2), es(3))),
    ("graft_bit_dot", es => BitDot(es(0), es(1))),
    ("graft_prefix_order", es => PrefixOrder(es(0), es(1))),
    ("graft_sorted_overlap", es => SortedOverlap(es(0), es(1))),
    ("graft_cms_estimate", es => CmsEstimate(es(0), es(1))),
    ("graft_kll_agg", es => KllSketchAgg(es.head).toAggregateExpression()),
    ("graft_kll_merge", es => KllMergeAgg(es.head).toAggregateExpression()),
    ("graft_kll_quantile", es => KllQuantile(es(0), es(1))),
    ("graft_theta_agg", es => ThetaSketchAgg(es.head).toAggregateExpression()),
    ("graft_theta_estimate", es => ThetaEstimate(es.head)),
    ("graft_theta_intersect", es => ThetaIntersect(es(0), es(1))),
    ("graft_theta_union_of", es => ThetaUnionOf(es(0), es(1))),
    ("graft_theta_a_not_b", es => ThetaANotB(es(0), es(1))))

  def register(spark: SparkSession): Unit = fns.foreach { case (name, b) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")
  }

  def hamming(a: Column, b: Column): Column = call_function("graft_hamming", a, b)
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def simhash(tokens: Column): Column = call_function("graft_simhash", tokens)
  def simhashMd5(tokens: Column): Column = call_function("graft_simhash_md5", tokens)
  def minhash32(shingles: Column): Column = call_function("graft_minhash32", shingles)
  def xx64(s: Column): Column = call_function("graft_xx64", s)
  def minhashText3x32(text: Column): Column =
    call_function("graft_minhash_text3_32", text)
  def nearestCell(vec: Column, cells: Column, cvecs: Column): Column =
    call_function("graft_nearest_cell", vec, cells, cvecs)

  def nearestCells(vec: Column, cells: Column, cvecs: Column, n: Column): Column =
    call_function("graft_nearest_cells", vec, cells, cvecs, n)

  def residualCode(vec: Column, cell: Column, cells: Column, cvecs: Column): Column =
    call_function("graft_residual_code", vec, cell, cells, cvecs)

  def residualNorm(vec: Column, cell: Column, cells: Column, cvecs: Column): Column =
    call_function("graft_residual_norm", vec, cell, cells, cvecs)

  def bitDot(code: Column, q: Column): Column =
    call_function("graft_bit_dot", code, q)

  def prefixOrder(hashes: Column, demoted: Column): Column =
    call_function("graft_prefix_order", hashes, demoted)

  def sortedOverlap(a: Column, b: Column): Column =
    call_function("graft_sorted_overlap", a, b)

  def cmsEstimate(sketch: Column, item: Column): Column =
    call_function("graft_cms_estimate", sketch, item)

  def kllAgg(values: Column): Column = call_function("graft_kll_agg", values)
  def kllMerge(sketches: Column): Column =
    call_function("graft_kll_merge", sketches)
  def kllQuantile(sketch: Column, q: Column): Column =
    call_function("graft_kll_quantile", sketch, q)

  def thetaAgg(items: Column): Column = call_function("graft_theta_agg", items)
  def thetaEstimate(sketch: Column): Column =
    call_function("graft_theta_estimate", sketch)
  def thetaIntersect(a: Column, b: Column): Column =
    call_function("graft_theta_intersect", a, b)
  def thetaUnionOf(a: Column, b: Column): Column =
    call_function("graft_theta_union_of", a, b)
  def thetaANotB(a: Column, b: Column): Column =
    call_function("graft_theta_a_not_b", a, b)
}
