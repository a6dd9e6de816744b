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

  /** Split documents into fixed-size token windows with stride — the
    * context-window chunking step that turns variable-length documents into
    * training sequences (stride < window = overlapping contexts). Zero
    * shuffle at any scale: tokenize + sequence + explode are per-row
    * expressions, and chunk ids are deterministic (doc id, start offset),
    * so the DuckDB oracle replays the exact output. */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    df.withColumn("_g_ts", TextAnalysis.tokens(col(textCol)))
      .withColumn("_g_start", explode(sequence(lit(0),
        greatest(size(col("_g_ts")) - 1, lit(0)), lit(stride))))
      .select(col(idCol),
        floor(col("_g_start") / lit(stride)).cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("_g_ts"), col("_g_start") + 1, lit(window)))
          .as("chunk_text"),
        least(size(col("_g_ts")) - col("_g_start"), lit(window))
          .as("n_chunk_tokens"))
      .filter(col("n_chunk_tokens") > 0)
  }

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
