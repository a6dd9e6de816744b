package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffling + sharding — the "global shuffle before
  * training" step of an LLM data pipeline: every document gets a stable
  * pseudorandom position so shards stream in a fixed, reproducible order
  * with no coherent runs of same-source/same-time documents.
  *
  * Not in the reference (its story ends at table storage); first-class here
  * per the engine's training-data scope.
  *
  * Scale shape: the permutation key is a per-row md5 over (seed, id) — a
  * map-only projection; `shard` is a modulus over the key's first 8 hex
  * digits, so rows route to shards with ONE hash shuffle (no global sort,
  * no total-order window: a single-partition `row_number()` would serialize
  * 100 TB through one task). Within a shard, `pos` orders by the remaining
  * key bytes via a window PARTITIONED BY shard — each shard sorts
  * independently in parallel. Reading shards in (shard, pos) order replays
  * the exact global permutation; changing `seed` re-deals the corpus.
  *
  * Fully SQL-replayable (md5 + hex parse exist in DuckDB with identical
  * semantics), so the oracle verifies the whole permutation bit-for-bit.
  */
object Shuffle {

  /** The md5 permutation key over (seed, id) — THE cross-engine replay
    * contract shared by every permutation-based operator (shuffleShards,
    * Sampling.sampleGroupK); the DuckDB oracles reproduce this expression
    * byte-for-byte (`md5(concat(seed, '#', CAST(id AS VARCHAR)))`), so it
    * must exist in exactly one place. `idCol` must be UNIQUE and NON-NULL
    * (the corpus primary key): a null id would diverge from the oracle's
    * concat semantics and duplicate ids would tie the permutation order. */
  def permutationKey(seed: String, idCol: Column): Column =
    md5(concat_ws("#", lit(seed), idCol.cast("string")))

  /** Assign every row a (shard, pos) under a deterministic permutation of
    * the corpus keyed by (seed, `idCol`). Output = input columns + `shard`
    * (0..numShards-1) + `pos` (1-based within shard). */
  def shuffleShards(
      df: DataFrame,
      idCol: String,
      numShards: Int,
      seed: String): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val key = permutationKey(seed, col(idCol))
    val shard = pmod(
      conv(substring(col("_g_key"), 1, 8), 16, 10).cast("long"),
      lit(numShards.toLong)).cast("int")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("_g_key"), col(idCol))
    df.withColumn("_g_key", key)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w))
      .drop("_g_key")
  }
}
