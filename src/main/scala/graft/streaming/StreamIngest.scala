package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DataTypes, StructType}

import graft.catalog.GraftCatalog
import graft.meta.MetaStore
import graft.tables.GraftTable

/** Multi-topic streaming ingestion (SURVEY.md §2.1 S12; reference:
  * kafka/KafkaStream.scala:25-191): route a stream of (topic, value-as-JSON)
  * records into ONE graft table per topic — tables auto-created on first
  * sight, schemas inferred from the JSON, new columns added as they appear,
  * rows appended per micro-batch with an optional processing-hour range
  * partition.
  *
  * SOURCE-AGNOSTIC by design: the reference hardwires the Kafka connector
  * (absent in this environment — no broker, no kafka-sql jars); here any
  * streaming DataFrame with `topic: STRING, value: STRING` columns plugs in:
  *
  *   // with kafka connector jars present:
  *   val src = spark.readStream.format("kafka")
  *     .option("kafka.bootstrap.servers", brokers)
  *     .option("subscribePattern", "events.*").load()
  *     .selectExpr("topic", "CAST(value AS STRING) AS value")
  *   StreamIngest.start(src, warehouse, "ns", ckpt)
  *
  * Improvements over the reference's at-least-once appends: a per-(table,
  * query) batch-id guard makes each destination table EXACTLY-ONCE under
  * replay, and new topics are discovered from the batch itself (no admin
  * client round-trip). */
object StreamIngest {

  val PartitionColumn = "graft_ingest_dt"

  /** Infer each topic's table schema from one sample JSON value — nested
    * structs are kept as raw JSON strings, matching the reference
    * (KafkaStream.topicValueToSchema). */
  def inferTopicSchemas(
      spark: SparkSession,
      samples: Map[String, String]): Map[String, StructType] =
    samples.map { case (topic, sample) =>
      val ds = spark.createDataset(Seq(sample))(
        org.apache.spark.sql.Encoders.STRING)
      val inferred = spark.read.json(ds).schema
      val flat = inferred.foldLeft(new StructType()) { (acc, f) =>
        f.dataType match {
          case _: StructType => acc.add(f.name, DataTypes.StringType, true)
          case dt => acc.add(f.name, dt, true)
        }
      }
      topic -> flat
    }

  /** Start routing `stream` (columns: topic, value) into
    * `<warehouse>/<namespace>/<topic>` graft tables. Returns the running
    * query; stop it or use Trigger.AvailableNow upstream of this call via
    * `trigger`. */
  def start(
      stream: DataFrame,
      warehouse: String,
      namespace: String,
      checkpoint: String,
      hourPartition: Boolean = false,
      queryName: String = "graft-stream-ingest",
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      clock: () => String = () =>
        new java.text.SimpleDateFormat("yyyyMMddHH")
          .format(new java.util.Date())): StreamingQuery = {
    require(stream.columns.contains("topic") && stream.columns.contains("value"),
      "ingestion stream needs `topic` and `value` (JSON string) columns")
    val store = MetaStore.default
    stream.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val dt = clock()
        // discover this batch's topics + one sample value per topic from the
        // DATA (one tiny aggregate job) — no external admin client needed
        val topicSamples = batch
          .groupBy(col("topic")).agg(first(col("value")).as("sample"))
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        if (topicSamples.nonEmpty) {
          val schemas = inferTopicSchemas(spark, topicSamples)
          schemas.foreach { case (topic, schema) =>
            val path = s"$warehouse/$namespace/$topic"
            val table =
              if (GraftTable.exists(path)) GraftTable.forPath(spark, path)
              else {
                val withDt =
                  if (hourPartition) schema.add(PartitionColumn, DataTypes.StringType)
                  else schema
                val t = GraftTable.createEmpty(spark, withDt, path,
                  rangeColumns = if (hourPartition) Seq(PartitionColumn) else Nil)
                GraftCatalog.register(spark, s"$namespace.$topic", path)
                t
              }
            // exactly-once per destination table under replay
            val guardId = s"$queryName#$topic"
            if (batchId > store.getMaxBatchId(path, guardId)) {
              // additive schema evolution: new JSON fields become new columns
              val known = table.schema.fieldNames.toSet
              schema.fields.filterNot(f => known.contains(f.name))
                .foreach(f => table.addColumn(f.name, f.dataType))
              var rows = batch.filter(col("topic") === topic)
                .withColumn("_g_payload", from_json(col("value"), schema))
                .select(col("_g_payload.*"))
              if (hourPartition) rows = rows.withColumn(PartitionColumn, lit(dt))
              table.append(rows)
              store.recordBatchId(path, guardId, batchId)
            }
          }
        }
      }
      .start()
  }
}
