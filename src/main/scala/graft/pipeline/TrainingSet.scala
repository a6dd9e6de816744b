package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-set curation: the canonical LLM data pipeline
  * composed from this package's operators, in the order the major published
  * pipelines run them:
  *
  *   quality filter -> exact dedup -> near-dup dedup (MinHash clusters,
  *   keep one representative) -> benchmark decontamination -> context-window
  *   chunking -> deterministic shuffle into training shards
  *
  * Every stage is the already-verified operator (gopher rules, hash dedup,
  * banded MinHash + connected components, broadcast n-gram decontamination,
  * per-row chunking, md5 permutation), so the composition inherits their
  * scale shapes: the corpus text is never crossJoined and never shuffled
  * except (a) 8-byte hashes for dedup, (b) the final chunk shuffle into
  * shards. The output is reproducible end to end from (input, config, seed).
  *
  * Stages toggle off via the config (e.g. no `testSet` -> no
  * decontamination; `chunkWindow = 0` -> keep whole documents).
  */
object TrainingSet {

  /** @param qualityPred  row filter applied first; default = the Gopher
    *                     rule verdict from [[TextAnalysis.gopherFilter]]
    * @param minhashThreshold near-dup Jaccard threshold (0 disables)
    * @param chunkWindow  tokens per training chunk (0 = whole documents)
    * @param numShards    output shards of the final permutation */
  case class Config(
      qualityPred: Option[Column] = None,
      minTokens: Int = 50,
      minhashThreshold: Double = 0.7,
      decontaminateNgram: Int = 8,
      chunkWindow: Int = 0,
      chunkStride: Int = 0,
      numShards: Int = 64,
      seed: String = "graft")

  /** Curate `docs` into shuffled training shards. Output columns: `shard`,
    * `pos`, the id column, (`chunk_idx`, `chunk_text`, `n_chunk_tokens`)
    * when chunking, else the original document columns. */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      testSet: Option[DataFrame] = None,
      cfg: Config = Config()): DataFrame = {
    // 1. quality gate (map-only)
    val flagged = TextAnalysis.gopherFilter(docs, textCol, cfg.minTokens)
    val keep = cfg.qualityPred.getOrElse(col("keep"))
    val quality = flagged.filter(keep)
      .select(docs.columns.map(graft.util.SchemaUtil.qcol): _*)

    // 2. exact dedup (one 8-byte-hash shuffle)
    val exact = Dedup.exact(quality, idCol, textCol)

    // 3. near-dup clusters -> keep min-id representative
    val nearDeduped =
      if (cfg.minhashThreshold <= 0) exact
      else Dedup.dedupByPairs(exact, idCol,
        Dedup.minhashNearDupPairs(exact, idCol, textCol, cfg.minhashThreshold))

    // 4. benchmark decontamination (test n-grams broadcast)
    val clean = testSet match {
      case Some(ts) => Decontaminate.decontaminate(
        nearDeduped, idCol, textCol, ts, textCol, cfg.decontaminateNgram)
      case None => nearDeduped
    }

    // 5. context-window chunking (per-row) — or whole documents
    val units =
      if (cfg.chunkWindow <= 0) clean
      else Packing.chunkDocuments(clean, idCol, textCol, cfg.chunkWindow,
        if (cfg.chunkStride > 0) cfg.chunkStride else cfg.chunkWindow)

    // 6. deterministic shuffle into training shards; the permutation key
    // covers (id, chunk_idx) so chunks of one document scatter too
    val keyed =
      if (units.columns.contains("chunk_idx"))
        units.withColumn("_g_sid",
          concat_ws(":", col(idCol).cast("string"), col("chunk_idx")))
      else units.withColumn("_g_sid", col(idCol).cast("string"))
    Shuffle.shuffleShards(keyed, "_g_sid", cfg.numShards, cfg.seed)
      .drop("_g_sid")
  }

  /** STREAMING curation — the continuous-ingestion form of the pipeline:
    * each micro-batch runs quality gate -> within-batch exact dedup ->
    * decontamination, is then checked against the ACCEPTED corpus through
    * the persisted [[NearDupIndex]] (exact dups collide in every band, so
    * the index subsumes cross-batch exact dedup — no corpus re-scan or
    * content-hash anti-join), and the survivors are upserted into the
    * output table and their signatures delta-upserted into the index.
    *
    * Exactly-once WITHOUT a batch-id guard: both writes are PK upserts
    * (output PK = idCol; index PK = (bh, doc_id)), so a replayed batch
    * recomputes the same survivors — its own earlier rows are invisible
    * to the check (the index join drops same-id matches) — and re-upserts
    * them idempotently. Cross-batch near-dup is vs the index only;
    * near-dups co-arriving in ONE batch (beyond exact) are admitted
    * together — the standard streaming-window trade; run the batch
    * [[curate]] on the accepted corpus when a global pass is needed.
    *
    * Per-batch cost is proportional to the BATCH: sign + band join +
    * candidate-bounded verify (the verify's id semi-join reaches the
    * output scan as a runtime filter, pruning corpus files through the
    * zone maps). Chunking/sharding stay batch post-processing of the
    * accepted corpus ([[curateToTable]]). */
  def curateStream(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      tablePath: String,
      indexPath: String,
      checkpoint: String,
      testSet: Option[DataFrame] = None,
      cfg: Config = Config(),
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.tables.GraftTable
    stream.writeStream
      .queryName("graft-stream-curate")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val flagged = TextAnalysis.gopherFilter(batch, textCol, cfg.minTokens)
        val keep = cfg.qualityPred.getOrElse(col("keep"))
        val quality = flagged.filter(keep)
          .select(batch.columns.map(graft.util.SchemaUtil.qcol): _*)
        val exact = Dedup.exact(quality, idCol, textCol)
        val clean = testSet match {
          case Some(ts) => Decontaminate.decontaminate(
            exact, idCol, textCol, ts, textCol, cfg.decontaminateNgram)
          case None => exact
        }
        val table =
          if (GraftTable.exists(tablePath)) GraftTable.forPath(spark, tablePath)
          else GraftTable.createEmpty(spark, batch.schema, tablePath,
            hashColumns = Seq(idCol), bucketNum = 4)
        val idx =
          if (GraftTable.exists(indexPath)) NearDupIndex.forPath(spark, indexPath)
          else NearDupIndex.create(spark, indexPath)
        val survivors =
          if (cfg.minhashThreshold <= 0) clean
          else {
            val hits = idx.check(clean, idCol, textCol,
              table.toDF.select(col(idCol), col(textCol)), cfg.minhashThreshold)
            clean.join(hits.select(col("id_b").as(idCol)).distinct(),
              Seq(idCol), "left_anti")
          }
        // computed ONCE (upsert + index add would re-run the whole check)
        val accepted = survivors.localCheckpoint()
        if (!accepted.isEmpty) {
          table.upsert(accepted)
          idx.add(accepted, idCol, textCol)
        }
        ()
      }
      .start()
  }

  /** [[curate]] materialized as a graft table RANGE-PARTITIONED BY `shard`:
    * a training reader streams one shard per partition (pure partition
    * pruning — `toDF(_ == "shard=7")`), rows within a shard ordered by
    * `pos`. The curation config and seed are recorded as table properties,
    * so the output carries its own provenance and is reproducible from
    * (input, properties). */
  def curateToTable(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tablePath: String,
      testSet: Option[DataFrame] = None,
      cfg: Config = Config()): graft.tables.GraftTable = {
    val out = curate(docs, idCol, textCol, testSet, cfg)
    graft.tables.GraftTable.create(docs.sparkSession, out, tablePath,
      rangeColumns = Seq("shard"),
      properties = Map(
        "graft.curation.seed" -> cfg.seed,
        "graft.curation.numShards" -> cfg.numShards.toString,
        "graft.curation.minTokens" -> cfg.minTokens.toString,
        "graft.curation.minhashThreshold" -> cfg.minhashThreshold.toString,
        "graft.curation.chunkWindow" -> cfg.chunkWindow.toString,
        "graft.curation.chunkStride" -> cfg.chunkStride.toString,
        "graft.curation.decontaminateNgram" -> cfg.decontaminateNgram.toString))
  }
}
