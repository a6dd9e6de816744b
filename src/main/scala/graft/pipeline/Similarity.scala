package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Mirrors the reference's vector story (SURVEY.md §2.7 X3: IVF-RaBitQ in
  * rust/lakesoul-vector, orchestrated by python/src/lakesoul/vector_index.py)
  * re-expressed Spark-first:
  *
  *  - brute-force: one codegen'd map over the table + TakeOrderedAndProject
  *    (no shuffle of vectors; only k rows reach the driver). The exact
  *    baseline every ANN variant is measured against.
  *  - IVF: coarse quantizer is a deterministic hashed-id sample (one
  *    TakeOrdered scan); every vector is assigned to its nearest centroid by
  *    ONE map-side codegen'd argmax expression over the centroid literals —
  *    no broadcast-join row amplification, no groupBy shuffle, no count()
  *    pre-passes. At 100 TB the assignment is a single map-only pass;
  *    per-query cost is |cell| * nprobe.
  */
object Similarity {

  /** Exact top-k by cosine for one query vector. */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int): DataFrame =
    df.select(col(idCol),
      round(GraftFunctions.cosine(col(vecCol), typedLit(query.toSeq)), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  /** Deterministic one-pass centroid pick: the `nlist` rows with the smallest
    * Knuth-multiplicative-hashed id ((id * 2654435761) mod 2^32) — uniform
    * over the id space, reproducible with no RNG state, plain-SQL-expressible
    * (the DuckDB oracle replays it verbatim), and a single
    * TakeOrderedAndProject scan instead of a count() pass + filter + limit.
    * Returns (cellId, centroidVec) in hash-rank order (ties broken by id —
    * the rank order IS the argmax tie-break order). */
  def selectCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int): Array[(Long, Array[Float])] =
    df.select(col(idCol).cast("long"), col(vecCol))
      .orderBy(pmod(col(idCol).cast("long") * lit(2654435761L), lit(4294967296L)),
        col(idCol))
      .limit(nlist)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  /** Column computing the nearest-centroid cell id for a vector column. */
  def nearestCell(vec: Column, cents: Array[(Long, Array[Float])]): Column =
    GraftFunctions.nearestCell(vec,
      typedLit(cents.map(_._1).toSeq),
      typedLit(cents.map(_._2.toSeq).toSeq))

  /** IVF "index": tag every vector with its nearest-centroid cell. Pure
    * map-side projection (zero shuffle, zero extra jobs). */
  def ivfAssign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[(Long, Array[Float])]): DataFrame =
    df.select(col(idCol), col(vecCol), nearestCell(col(vecCol), cents).as("cell"))

  /** Driver-side cosine (same double-accumulation as Kernels.cosine). */
  private def cosineLocal(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var i = 0; var dot = 0.0; var na = 0.0; var nb = 0.0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** The `nprobe` cell ids nearest to the query — computed on the driver from
    * the (tiny) centroid array; no Spark job. */
  def probeCells(
      cents: Array[(Long, Array[Float])],
      query: Array[Float],
      nprobe: Int): Seq[Long] =
    cents.zipWithIndex
      .map { case ((cell, cv), rk) => (cell, cosineLocal(cv, query), rk) }
      .sortBy { case (_, sim, rk) => (-sim, rk) }
      .take(nprobe).map(_._1).toSeq

  /** ANN top-k through an IVF assignment: probe the `nprobe` cells whose
    * centroids are closest to the query, exact-rank within them. */
  def ivfTopK(
      assigned: DataFrame,
      cents: Array[(Long, Array[Float])],
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      nprobe: Int): DataFrame = {
    val q = typedLit(query.toSeq)
    assigned.filter(col("cell").isin(probeCells(cents, query, nprobe): _*))
      .select(col(idCol),
        round(GraftFunctions.cosine(col(vecCol), q), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Convenience: build IVF + search in one call (index reused across queries
    * in real use; rebuilt here for a self-contained operator). Exactly two
    * jobs: the centroid TakeOrdered and the probe scan. */
  def annSearch(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val cents = selectCentroids(df, idCol, vecCol, nlist)
    ivfTopK(ivfAssign(df, idCol, vecCol, cents), cents, idCol, vecCol, query,
      k, nprobe)
  }

  /** IVF-BQ ANN — the reference's IVF-RaBitQ index
    * (rust/lakesoul-vector/src/rabitq: 1-bit residual quantization +
    * re-rank) re-expressed Spark-first with its two essential moves kept:
    *
    *  1. QUANTIZE: each corpus vector stores only the SIGN BITS of its
    *     residual against its cell's centroid (dim bits instead of dim
    *     floats — a 32x memory cut; one codegen'd map pass).
    *  2. ESTIMATE + RERANK: candidates in probed cells are pre-ranked by
    *     the ASYMMETRIC estimate the RaBitQ family actually queries with —
    *     the query stays float, the row contributes its code and one stored
    *     scalar (the residual norm):
    *       v_hat   = c + (|r|/sqrt(d)) * s        (s = the +-1 sign vector)
    *       est_cos = (q.c + (|r|/sqrt(d)) * sum_i(+-q_i))
    *                 / (|q| * sqrt(|c|^2 + |r|^2))
    *     then only the top `k * refine` survivors pay the exact cosine.
    *     (A symmetric hamming pre-rank measured ~0.1 recall on this corpus;
    *     keeping the query un-quantized is what makes 1-bit codes usable.)
    *
    * At 100 TB the scan over a probed cell touches 12 bytes/row (code +
    * scalar) instead of 256+ (the vector); exact vectors are fetched for
    * the refine set only. Deterministic end to end (sign boundary `>=`,
    * estimate rounded to 6 then id tie-break), so the DuckDB oracle
    * replays the whole pipeline — quantization included — verbatim. */
  def annSearchQuantized(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      refine: Int = 4): DataFrame = {
    val cents = selectCentroids(df, idCol, vecCol, nlist)
    if (cents.isEmpty) // empty corpus: empty result, like annSearch
      return df.select(col(idCol), lit(0.0).as("cosine")).limit(0)
    val cellsLit = typedLit(cents.map(_._1).toSeq)
    val cvecsLit = typedLit(cents.map(_._2.toSeq).toSeq)
    val assigned = df.select(col(idCol), col(vecCol),
      GraftFunctions.nearestCell(col(vecCol), cellsLit, cvecsLit).as("cell"))
    // the stored "index": 1-bit/dim code + one scalar per row
    val coded = assigned
      .withColumn("_g_code",
        GraftFunctions.residualCode(col(vecCol), col("cell"), cellsLit, cvecsLit))
      .withColumn("_g_rnorm",
        GraftFunctions.residualNorm(col(vecCol), col("cell"), cellsLit, cvecsLit))
    val probes = probeCells(cents, query, nprobe)
    coded.filter(col("cell").isin(probes: _*))
      .withColumn("_g_est",
        bqEstimate(cents, probes, query, col("_g_code"), col("_g_rnorm"),
          col("cell")))
      .orderBy(col("_g_est").desc, col(idCol))
      .limit(k * refine)
      .select(col(idCol),
        round(GraftFunctions.cosine(col(vecCol), typedLit(query.toSeq)), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** The IVF-BQ estimated-cosine column, switched on the candidate row's
    * cell (nprobe branches of codegen'd scalar math — no join, no extra
    * shuffle), rounded to 6 so independent replays rank identically. */
  private[pipeline] def bqEstimate(
      cents: Array[(Long, Array[Float])],
      probes: Seq[Long],
      query: Array[Float],
      codeCol: Column,
      rnormCol: Column,
      cellCol: Column): Column = {
    val centMap = cents.toMap
    val d = query.length
    val qNorm = math.sqrt(query.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    def dotLocal(c: Array[Float]): Double = {
      var i = 0; var acc = 0.0
      while (i < d) { acc += query(i).toDouble * c(i).toDouble; i += 1 }
      acc
    }
    def cnorm2(c: Array[Float]): Double = {
      var i = 0; var acc = 0.0
      while (i < c.length) { acc += c(i).toDouble * c(i).toDouble; i += 1 }
      acc
    }
    val qLit = typedLit(query.toSeq)
    def estFor(cell: Long): Column = {
      val c = centMap(cell)
      (lit(dotLocal(c)) +
        rnormCol / math.sqrt(d.toDouble) * GraftFunctions.bitDot(codeCol, qLit)) /
        (lit(qNorm) * sqrt(lit(cnorm2(c)) + rnormCol * rnormCol))
    }
    round(probes.tail.foldLeft(
      when(cellCol === probes.head, estFor(probes.head))) {
      (acc, cell) => acc.when(cellCol === cell, estFor(cell))
    }, 6)
  }

  /** The per-row probe-cell tagging for a KNN JOIN: each query row gets its
    * `nprobe` nearest cells (one codegen'd map pass), exploded to one row
    * per (query, cell). */
  def probeAssign(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[(Long, Array[Float])],
      nprobe: Int): DataFrame =
    queries.select(col(idCol), col(vecCol),
      explode(GraftFunctions.nearestCells(col(vecCol),
        typedLit(cents.map(_._1).toSeq),
        typedLit(cents.map(_._2.toSeq).toSeq),
        lit(nprobe))).as("cell"))

  /** KNN JOIN (batch retrieval): for EVERY row of `queries`, the `k` nearest
    * `corpus` rows by cosine — the two-table form of [[annSearch]], the
    * retrieval primitive behind RAG indexing, semantic dedup across corpora,
    * and train/test leakage checks at corpus scale.
    *
    * Plan shape (scale path): centroids = one TakeOrdered scan of the corpus;
    * both sides then get ONE map-only codegen pass (corpus -> nearest cell,
    * queries -> nprobe probe cells, exploded); the equi-join on `cell`
    * shuffles each side once (queries amplified nprobe-x, corpus 1-x — never
    * the |Q| x |C| crossJoin); per-query top-k is a window over the join's
    * candidate rows (|cell| * nprobe per query). Recall/cost dials are
    * (nlist, nprobe) exactly as in the reference's IVF
    * (python/src/lakesoul/vector_index.py).
    *
    * Deterministic + SQL-replayable: hashed-id centroids, argmax assignment
    * with rank tie-break, candidate ranking by (rounded cosine desc, corpus
    * id) — the DuckDB oracle replays the whole pipeline verbatim. */
  def annJoin(
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      corpus: DataFrame,
      cIdCol: String,
      cVecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g_qid"))
      .orderBy(col("cosine").desc, col("_g_cid"))
    annCandidates(queries, qIdCol, qVecCol, corpus, cIdCol, cVecCol,
      nlist, nprobe)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("_g_qid").as("query_id"), col("_g_cid").as("corpus_id"),
        col("cosine"), col("rank"))
  }

  /** kNN label propagation (semi-supervised corpus labeling): each unlabeled
    * vector takes the majority label of its k nearest LABELED neighbors,
    * retrieved through the shared deterministic IVF ([[annJoin]] — never
    * |Q|×|C|). Ties break by (count desc, best cosine desc, label asc) so
    * the assignment is deterministic. Returns (query id, predicted label,
    * n_votes). */
  def knnClassify(
      unlabeled: DataFrame,
      qIdCol: String,
      qVecCol: String,
      labeled: DataFrame,
      cIdCol: String,
      cVecCol: String,
      labelCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val nn = annJoin(unlabeled, qIdCol, qVecCol, labeled, cIdCol, cVecCol,
      k, nlist, nprobe)
      .join(labeled.select(col(cIdCol).as("corpus_id"),
        col(labelCol).as("_g_lbl")), "corpus_id")
    val votes = nn.groupBy(col("query_id"), col("_g_lbl"))
      .agg(count(lit(1)).as("n_votes"), max(col("cosine")).as("_g_best"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("n_votes").desc, col("_g_best").desc, col("_g_lbl"))
    votes.withColumn("_g_rn", row_number().over(w))
      .filter(col("_g_rn") === 1)
      .select(col("query_id").as(qIdCol), col("_g_lbl").as(labelCol),
        col("n_votes"))
  }

  /** Shared candidate generation for the KNN join family — IVF assignment
    * of the corpus, nprobe-exploded queries, one equi-join on `cell`,
    * rounded cosine. One definition so the deterministic rounding/
    * tie-break contract the DuckDB oracles replay cannot diverge between
    * [[annJoin]] (adds the per-query top-k window) and
    * `Decontaminate.semanticHits` (adds the threshold filter). Output
    * columns: `_g_qid`, `_g_cid`, `cosine`. */
  private[pipeline] def annCandidates(
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      corpus: DataFrame,
      cIdCol: String,
      cVecCol: String,
      nlist: Int,
      nprobe: Int): DataFrame = {
    val cents = selectCentroids(corpus, cIdCol, cVecCol, nlist)
    val assigned = ivfAssign(corpus, cIdCol, cVecCol, cents)
      .select(col(cIdCol).as("_g_cid"), col(cVecCol).as("_g_cvec"), col("cell"))
    val probed = probeAssign(queries, qIdCol, qVecCol, cents, nprobe)
      .select(col(qIdCol).as("_g_qid"), col(qVecCol).as("_g_qvec"), col("cell"))
    probed.join(assigned, "cell")
      .select(col("_g_qid"), col("_g_cid"),
        round(GraftFunctions.cosine(col("_g_qvec"), col("_g_cvec")), 6).as("cosine"))
  }

  /** Lloyd's k-means over an embedding column — corpus clustering for
    * data-mixture balancing / per-cluster sampling at pre-training scale.
    *
    * Deterministic and SQL-replayable end to end: init = [[selectCentroids]]
    * (Knuth-hash pick, no RNG), assignment = the codegen'd [[nearestCell]]
    * argmax (cosine; lowest rank wins ties), update = per-dimension mean
    * QUANTIZED to 6 decimals and float precision, so an independent replay
    * (the DuckDB oracle) lands on bit-identical centroids each round.
    * Clusters that lose every point simply drop out of the next round (both
    * engines derive the centroid set from the surviving groups).
    *
    * Scale shape: per iteration the corpus itself never shuffles — the
    * assignment is a map-only codegen pass, and the update aggregates
    * `dim` per-cluster partial sums with map-side combine, shuffling only
    * k rows x dim columns. Driver state = k*dim floats re-broadcast as
    * expression literals. At 100 TB this is iters map passes + iters
    * k-row collects.
    */
  def kmeans(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame =
    kmeansAssign(df, idCol, vecCol,
      kmeansCentroids(df, idCol, vecCol, k, iters))

  /** Fit the Lloyd's centroids alone — reusable state: persist them, assign
    * future batches with [[kmeansAssign]] (the streaming / incremental-corpus
    * regime: fit once on a sample, assign everything else map-only). */
  def kmeansCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): Array[(Long, Array[Float])] = {
    val dim = df.select(size(col(vecCol)).as("d")).head.getInt(0)
    var cents: Array[(Long, Array[Float])] =
      selectCentroids(df, idCol, vecCol, k)
        .zipWithIndex.map { case ((_, v), rk) => (rk.toLong, v) }
    for (_ <- 1 to iters) {
      val assigned = df.select(col(vecCol).as("_g_v"),
        nearestCell(col(vecCol), cents).as("_g_c"))
      val sums = (0 until dim).map(i =>
        sum(element_at(col("_g_v"), i + 1).cast("double")).as(s"_g_s$i"))
      val rows = assigned.groupBy("_g_c")
        .agg(count(lit(1)).as("_g_n"), sums: _*)
        .orderBy("_g_c")
        .collect()
      cents = rows.map { r =>
        val n = r.getLong(1).toDouble
        (r.getLong(0), Array.tabulate(dim) { i =>
          // HALF_UP at 6 decimals then float — Spark round() semantics,
          // reproducible from SQL via CAST(round(x, 6) AS REAL)
          BigDecimal(r.getDouble(i + 2) / n)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toFloat
        })
      }
    }
    cents
  }

  /** Map-only cluster assignment with fitted centroids (zero shuffle). */
  def kmeansAssign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[(Long, Array[Float])]): DataFrame =
    df.select(col(idCol), nearestCell(col(vecCol), cents).as("cluster"))

  /** Pairwise hamming distance over binary embeddings (Array[Long]) — the
    * reference's lakesoul_hamming_distance surface (HammingDistFunc.scala).
    * DOCUMENTED BRUTE-FORCE BASELINE (O(n^2) crossJoin) — only for bounded
    * subsets / verification; the scale path is [[bandedHammingPairs]]. */
  def hammingPairs(
      df: DataFrame,
      idCol: String,
      bitsCol: String,
      maxDist: Int): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(bitsCol).as("_g_ba"))
    val b = df.select(col(idCol).as("id_b"), col(bitsCol).as("_g_bb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", GraftFunctions.hamming(col("_g_ba"), col("_g_bb")))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  /** Banded hamming near-dup pairs over Array[Long] bit signatures: 16-bit
    * chunk LSH (pigeonhole-complete for maxDist <= 4*words - 1), exact
    * popcount verify on same-bucket candidates only. One bucket shuffle —
    * linear in corpus size, never O(n^2). */
  def bandedHammingPairs(
      df: DataFrame,
      idCol: String,
      bitsCol: String,
      maxDist: Int,
      maxBucket: Int = 200): DataFrame = {
    val sig = df.select(col(idCol).as("_g_id"), col(bitsCol).as("_g_bits"))
    val banded = sig.select(col("_g_id"), explode(expr(
      "flatten(transform(_g_bits, (w, j) -> transform(sequence(0, 3), " +
        "c -> struct(j * 4 + c AS ci, shiftrightunsigned(w, c * 16) & 65535 AS cv))))"))
      .as("_g_ch"))
      .select(col("_g_id"), col("_g_ch.ci").as("_g_ci"), col("_g_ch.cv").as("_g_cv"))
    val cands = Dedup.bucketPairs(banded, Seq("_g_ci", "_g_cv"), "_g_id", maxBucket)
    cands
      .join(sig.select(col("_g_id").as("id_a"), col("_g_bits").as("_g_ba")), "id_a")
      .join(sig.select(col("_g_id").as("id_b"), col("_g_bits").as("_g_bb")), "id_b")
      .select(col("id_a"), col("id_b"),
        GraftFunctions.hamming(col("_g_ba"), col("_g_bb")).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }
}
