package graft.streaming

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Kafka-fronted multi-topic ingestion (SURVEY.md §2.1 S12; reference:
  * kafka/KafkaStream.scala:69-73,96-191): the thin source-construction half
  * that [[StreamIngest]] deliberately leaves out. The reference hardwires
  * `spark.readStream.format("kafka")` with a subscribe pattern, starting
  * offsets, a per-trigger offset cap and `failOnDataLoss=false`
  * (KafkaStream.createStreamDF); this object reproduces that wiring 1:1 on
  * the public DataFrame API and hands the resulting `(topic, value)` frame
  * to the source-agnostic router, which owns table auto-creation, JSON
  * schema inference, additive evolution and the exactly-once batch guard.
  *
  * The `kafka` format resolves at RUNTIME from the classpath
  * (spark-sql-kafka-0-10 + a reachable broker) — neither exists in this
  * sandbox, so [[available]] reports whether the connector can load and
  * [[source]] fails fast with a clear message instead of a deep
  * ClassNotFoundException out of query start. Everything downstream of the
  * source (the router itself) is oracled through the real streaming path by
  * the `stream_ingest` query using an in-sandbox source. */
object KafkaIngest {

  /** Connector knobs the reference exposes (KafkaStream.main args 0-6 and
    * createStreamDF); `extra` passes through any further `kafka.*` consumer
    * property (e.g. security.protocol, sasl.jaas.config). */
  final case class KafkaOptions(
      brokers: String,
      topicPattern: String,
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Long = 100000L,
      failOnDataLoss: Boolean = false,
      extra: Map[String, String] = Map.empty)

  /** True iff the kafka streaming connector is resolvable on this
    * classpath (it is not in the sandbox — no kafka-sql jars). */
  def available(spark: SparkSession): Boolean =
    Try(org.apache.spark.sql.execution.datasources.DataSource
      .lookupDataSource("kafka", spark.sessionState.conf)).isSuccess

  /** The reference's createStreamDF shape, projected to the router's
    * `(topic, value)` contract. */
  def source(spark: SparkSession, opts: KafkaOptions): DataFrame = {
    if (!available(spark))
      throw new IllegalStateException(
        "kafka connector not on the classpath: add spark-sql-kafka-0-10 " +
          "(and a reachable broker) to use KafkaIngest; StreamIngest.start " +
          "accepts any (topic, value) streaming DataFrame in the meantime")
    val reader = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", opts.brokers)
      .option("subscribePattern", opts.topicPattern)
      .option("startingOffsets", opts.startingOffsets)
      .option("maxOffsetsPerTrigger", opts.maxOffsetsPerTrigger)
      .option("failOnDataLoss", opts.failOnDataLoss)
    opts.extra.foreach { case (k, v) => reader.option(k, v) }
    reader.load().selectExpr("topic", "CAST(value AS STRING) AS value")
  }

  /** Kafka topics → one graft table per topic under
    * `<warehouse>/<namespace>/`, exactly-once per table. */
  def start(
      spark: SparkSession,
      opts: KafkaOptions,
      warehouse: String,
      namespace: String,
      checkpoint: String,
      hourPartition: Boolean = false): StreamingQuery =
    StreamIngest.start(source(spark, opts), warehouse, namespace, checkpoint,
      hourPartition, queryName = s"graft-kafka-ingest-${opts.topicPattern}")

  /** CLI parity with the reference's entrypoint (KafkaStream.main:96-120):
    * brokers topicPattern warehouse checkpoint namespace startingOffsets
    * [hourPartition]. */
  def main(args: Array[String]): Unit = {
    require(args.length >= 6,
      "usage: brokers topicPattern warehouse checkpoint namespace " +
        "startingOffsets [hourPartition]")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .getOrCreate()
    val q = start(spark,
      KafkaOptions(args(0), args(1), startingOffsets = args(5)),
      args(2), args(4), args(3),
      hourPartition = Try(args(6).toBoolean).getOrElse(false))
    q.awaitTermination()
  }
}
