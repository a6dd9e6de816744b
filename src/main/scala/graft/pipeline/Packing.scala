package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget document packing: assign documents to fixed-size training
  * batches ("packs") by running token count — the batching step a
  * pretraining data pipeline runs after dedup/filtering.
  *
  * Scale design: a GLOBAL greedy pack would need a total order (single
  * partition — a non-starter at 100 TB). Instead documents are spread over
  * `numShards` deterministic hash shards and packed within each shard with
  * one windowed cumulative sum — numShards bounds the window parallelism
  * and each (shard, pack) is a well-formed batch. Fully deterministic
  * (Knuth-hash sharding + id order), so results replay across runs and the
  * DuckDB oracle reproduces them exactly. Documents keep their identity
  * (batch MEMBERSHIP assignment; splitting/padding is a tokenizer-side
  * concern). */
object Packing {

  def packDocuments(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      numShards: Int = 64): DataFrame = {
    val shard = pmod(col(idCol).cast("long") * lit(2654435761L), lit(numShards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn("_g_cum", sum(col(tokenCol)).over(w))
      // pack index = the budget bin of the document's STARTING offset
      .withColumn("pack",
        floor((col("_g_cum") - col(tokenCol)) / lit(budget.toDouble)).cast("long"))
      .drop("_g_cum")
  }
}
