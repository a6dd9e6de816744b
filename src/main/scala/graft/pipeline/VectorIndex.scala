package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.tables.GraftTable

/** Persisted IVF vector index (SURVEY.md §2.7 X3; reference:
  * rust/lakesoul-vector IVF-RaBitQ + python/src/lakesoul/vector_index.py).
  *
  * The index is a SIDECAR graft table (`<path>/_g_vecindex`) holding
  * (cell, id, vec), hash-partitioned by id and range-partitioned by cell —
  * so a search's candidate fetch is pure partition pruning on the cell
  * column, the same mechanism the reference uses (per-partition index
  * shards). Centroids are a deterministic id-sample persisted alongside.
  * Build is one pass over the data (broadcast centroid assignment); searches
  * read only `nprobe` cells.
  */
class VectorIndex private (
    spark: SparkSession,
    indexTable: GraftTable,
    centroidTable: GraftTable,
    idCol: String,
    vecCol: String) {

  /** The persisted centroids, re-sorted into the deterministic hash-rank
    * order used at build time — this ordering IS the assignment/probe
    * tie-break, so every read path must share it (one definition). */
  private def loadCentroids(): Array[(Long, Array[Float])] =
    centroidTable.toDF.select(col("cell"), col("cvec")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy { case (cell, _) =>
        (Math.floorMod(cell * 2654435761L, 4294967296L), cell) }

  private def requireBqColumns(op: String): Unit = {
    val cols = indexTable.schema.fieldNames.toSet
    require(cols.contains("bqcode") && cols.contains("bqnorm"),
      s"$op needs the quantized code columns; this index predates them — " +
        "rebuild it with VectorIndex.build")
  }

  /** Remove vectors by id — DELETION MAINTENANCE for the IVF index (the
    * reference's RaBitQ index is append-only): the matching (cell, id)
    * rows are killed with a TOMBSTONE run, so removal writes O(removed)
    * bytes and rewrites nothing; compaction materializes on cadence. This
    * completes the mutable-embedding contract documented on [[append]]:
    * `remove(changedIds); append(changedVecs)` relocates a vector cleanly
    * even when it hops cells. */
  def remove(ids: DataFrame): Unit = {
    val keyed = ids.toDF("_g_rm")
    val matched = indexTable.toDF
      .join(broadcast(keyed), col(idCol) === col("_g_rm"), "left_semi")
    indexTable.applyChanges(matched.withColumn("_change_type", lit("delete")))
  }

  def remove(ids: Seq[Long]): Unit = {
    import spark.implicits._
    remove(ids.toDF("_g_rm"))
  }

  /** Top-k by cosine, probing the nprobe nearest cells. Probe selection is
    * driver-side over the (tiny) collected centroids. */
  def search(query: Array[Float], k: Int, nprobe: Int = 4): DataFrame = {
    val q = typedLit(query.toSeq)
    val cents = loadCentroids()
    val cells = Similarity.probeCells(cents, query, nprobe)
      .map(_.toString).toSet
    val descs = cells.map(c => s"cell=$c")
    indexTable.toDF(d => descs.contains(d))
      .select(col(idCol),
        round(GraftFunctions.cosine(col(vecCol), q), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Incremental maintenance: assign NEW vectors to the existing centroids
    * (map-only) and UPSERT them into the index — the sidecar is a plain
    * graft PK table, so growing the corpus reuses the format's delta-write
    * machinery (no rebuild, no read of existing index data; compaction
    * folds the delta runs on cadence like any other table). Re-upserting
    * an id replaces its entry (last-writer-wins on the PK) as long as the
    * vector still maps to the same cell; a CHANGED vector that hops cells
    * leaves the old entry behind (cell is the range-partition key) — for
    * mutable embeddings delete the old id first, or rebuild. Centroids
    * stay fixed — the standard IVF regime; rebuild when drift matters. */
  def append(df: DataFrame): Unit = {
    requireBqColumns("append")
    val cents = loadCentroids()
    val cellsLit = typedLit(cents.map(_._1).toSeq)
    val cvecsLit = typedLit(cents.map(_._2.toSeq).toSeq)
    indexTable.upsert(Similarity.ivfAssign(df, idCol, vecCol, cents)
      .select(col("cell"), col(idCol), col(vecCol),
        GraftFunctions.residualCode(col(vecCol), col("cell"),
          cellsLit, cvecsLit).as("bqcode"),
        GraftFunctions.residualNorm(col(vecCol), col("cell"),
          cellsLit, cvecsLit).as("bqnorm")))
  }

  /** Quantized top-k: the pre-rank pass scans ONLY (id, cell, bqcode,
    * bqnorm) of the probed cells — column pruning drops the vector column,
    * so the hot scan reads 12 bytes/row of codes instead of the embeddings;
    * full vectors are fetched for the `k * refine` survivors only (an id
    * IN-filter over the same pruned partitions) and exact-reranked. */
  def searchQuantized(query: Array[Float], k: Int,
      nprobe: Int = 4, refine: Int = 4): DataFrame = {
    requireBqColumns("searchQuantized")
    val cents = loadCentroids()
    if (cents.isEmpty)
      return indexTable.toDF(_ => false)
        .select(col(idCol), lit(0.0).as("cosine")).limit(0)
    val probes = Similarity.probeCells(cents, query, nprobe)
    val descs = probes.map(c => s"cell=$c").toSet
    val pruned = indexTable.toDF(d => descs.contains(d))
    // the pre-rank reads ONLY the skinny columns — pushed into the reader
    // (matters on multi-run indexes too, where the merge path decodes just
    // the requested columns plus keys)
    val candidateIds = indexTable
      .toDF(d => descs.contains(d), Seq(idCol, "cell", "bqcode", "bqnorm"))
      .select(col(idCol), Similarity.bqEstimate(cents, probes, query,
        col("bqcode"), col("bqnorm"), col("cell")).as("_g_est"))
      .orderBy(col("_g_est").desc, col(idCol))
      .limit(k * refine)
      .collect().map(_.get(0))
    pruned.filter(col(idCol).isin(candidateIds: _*))
      .select(col(idCol),
        round(GraftFunctions.cosine(col(vecCol), typedLit(query.toSeq)), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}

object VectorIndex {

  /** Build (or rebuild) the IVF index for `df` under `basePath`. */
  def build(
      spark: SparkSession,
      df: DataFrame,
      basePath: String,
      idCol: String,
      vecCol: String,
      nlist: Int = 16): VectorIndex = {
    GraftFunctions.register(spark)
    // deterministic hashed-id centroid sample (one TakeOrdered scan), then a
    // single map-side argmax assignment — the index build's only full pass
    // is the bucketed table write itself (no count(), no assignment shuffle)
    val cents = Similarity.selectCentroids(df, idCol, vecCol, nlist)
    val centroids = spark.createDataFrame(
      spark.sparkContext.parallelize(cents.toSeq.map {
        case (cell, cv) => org.apache.spark.sql.Row(cell, cv.toSeq)
      }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cvec",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    // alongside the full vector, the 1-bit residual code + its scalar
    // (IVF-BQ; reference rust/lakesoul-vector quantizer.rs): searches can
    // then scan 12 bytes/row instead of the vector column
    val cellsLit = typedLit(cents.map(_._1).toSeq)
    val cvecsLit = typedLit(cents.map(_._2.toSeq).toSeq)
    val assigned = Similarity.ivfAssign(df, idCol, vecCol, cents)
      .select(col("cell"), col(idCol), col(vecCol),
        GraftFunctions.residualCode(col(vecCol), col("cell"),
          cellsLit, cvecsLit).as("bqcode"),
        GraftFunctions.residualNorm(col(vecCol), col("cell"),
          cellsLit, cvecsLit).as("bqnorm"))

    val idxPath = s"$basePath/_g_vecindex"
    val cenPath = s"$basePath/_g_veccentroids"
    Seq(idxPath, cenPath).foreach { p =>
      if (GraftTable.exists(p)) GraftTable.forPath(spark, p).dropTable()
    }
    val idxT = GraftTable.create(spark, assigned, idxPath,
      rangeColumns = Seq("cell"), hashColumns = Seq(idCol),
      bucketNum = math.max(2, nlist / 2))
    val cenT = GraftTable.create(spark, centroids, cenPath,
      hashColumns = Seq("cell"), bucketNum = 2)
    new VectorIndex(spark, idxT, cenT, idCol, vecCol)
  }

  /** Open a previously built index. */
  def forPath(spark: SparkSession, basePath: String,
      idCol: String, vecCol: String): VectorIndex = {
    GraftFunctions.register(spark)
    new VectorIndex(spark,
      GraftTable.forPath(spark, s"$basePath/_g_vecindex"),
      GraftTable.forPath(spark, s"$basePath/_g_veccentroids"), idCol, vecCol)
  }
}
