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

  /** Top-k by cosine, probing the nprobe nearest cells. */
  def search(query: Array[Float], k: Int, nprobe: Int = 4): DataFrame = {
    val q = typedLit(query.toSeq)
    val cells = centroidTable.toDF
      .select(col("cell"), GraftFunctions.cosine(col("cvec"), q).as("sim"))
      .orderBy(col("sim").desc).limit(nprobe)
      .select(col("cell").cast("string")).collect().map(_.getString(0)).toSet
    val descs = cells.map(c => s"cell=$c")
    indexTable.toDF(d => descs.contains(d))
      .select(col(idCol),
        round(GraftFunctions.cosine(col(vecCol), q), 6).as("cosine"))
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
    val n = df.count()
    val stride = math.max(1L, n / nlist)
    val centroids = df.filter(pmod(col(idCol), lit(stride)) === 0).limit(nlist)
      .select(col(idCol).as("cell"), col(vecCol).as("cvec"))
    val assigned = df.select(col(idCol), col(vecCol))
      .join(broadcast(centroids))
      .withColumn("_g_sim", GraftFunctions.cosine(col(vecCol), col("cvec")))
      .groupBy(col(idCol))
      .agg(max_by(struct(col("cell"), col(vecCol).as("v")), col("_g_sim")).as("b"))
      .select(col("b.cell").as("cell"), col(idCol), col("b.v").as(vecCol))

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
