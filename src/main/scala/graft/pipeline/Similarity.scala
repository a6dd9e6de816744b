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
  *  - IVF: coarse quantizer built from a deterministic row sample; vectors
  *    are assigned to their nearest centroid once (a broadcast join — the
  *    "index build"), searches probe only `nprobe` cells. At 100 TB the
  *    assignment is the only full pass; per-query cost is |cell|*nprobe.
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

  /** IVF "index": assign every vector to its nearest centroid. Centroids are
    * a deterministic sample (every `stride`-th id), so the index is
    * reproducible without any RNG state. Returns (id, vec, cell). */
  def ivfAssign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int): DataFrame = {
    val n = df.count()
    val stride = math.max(1L, n / nlist)
    val centroids = df
      .filter(pmod(col(idCol), lit(stride)) === 0).limit(nlist)
      .select(col(idCol).as("_g_cell"), col(vecCol).as("_g_cvec"))
    df.select(col(idCol), col(vecCol))
      .join(broadcast(centroids))
      .withColumn("_g_sim", GraftFunctions.cosine(col(vecCol), col("_g_cvec")))
      .groupBy(col(idCol))
      .agg(max_by(struct(col("_g_cell"), col(vecCol).as("v")), col("_g_sim")).as("_g_best"))
      .select(col(idCol), col("_g_best.v").as(vecCol), col("_g_best._g_cell").as("cell"))
  }

  /** ANN top-k through an IVF assignment: probe the `nprobe` cells whose
    * centroids are closest to the query, exact-rank within them. */
  def ivfTopK(
      assigned: DataFrame,
      centroidsOf: DataFrame, // (cell, centroid vec) — from ivfAssign's sample
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      nprobe: Int): DataFrame = {
    val q = typedLit(query.toSeq)
    val probeCells = centroidsOf
      .select(col("_g_cell"), GraftFunctions.cosine(col("_g_cvec"), q).as("_g_sim"))
      .orderBy(col("_g_sim").desc).limit(nprobe)
      .select(col("_g_cell").as("cell"))
    assigned.join(broadcast(probeCells), "cell")
      .select(col(idCol),
        round(GraftFunctions.cosine(col(vecCol), q), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Convenience: build IVF + search in one call (index reused across queries
    * in real use; rebuilt here for a self-contained operator). */
  def annSearch(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val n = df.count()
    val stride = math.max(1L, n / nlist)
    val centroids = df
      .filter(pmod(col(idCol), lit(stride)) === 0).limit(nlist)
      .select(col(idCol).as("_g_cell"), col(vecCol).as("_g_cvec"))
    val assigned = ivfAssign(df, idCol, vecCol, nlist)
    ivfTopK(assigned, centroids, idCol, vecCol, query, k, nprobe)
  }

  /** Pairwise hamming distance over binary embeddings (Array[Long]) — the
    * reference's lakesoul_hamming_distance surface (HammingDistFunc.scala). */
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
}
