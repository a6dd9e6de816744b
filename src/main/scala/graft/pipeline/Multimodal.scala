package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines. Media is carried as opaque `binary` columns plus a typed
  * metadata struct (the lakehouse pattern: bytes in parquet, features as
  * columns).
  *
  * The actual codec step (JPEG decode, audio resample, video frame-grab) is
  * STUBBED behind [[MediaCodec]] with a deterministic byte-level fake —
  * image/audio libraries are not available in this environment. Everything
  * Spark-side is real and tested: the schema, the per-partition batched
  * processing shape (mapPartitions over an iterator, the Scala analogue of
  * mapInPandas batches), partition-parallel feature extraction, and the
  * frame-sampling row-explosion.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType), // image | audio | video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType)))

  /** The pluggable codec boundary. Production would bind an actual decoder;
    * the deterministic fake hashes bytes so tests are stable. */
  trait MediaCodec extends Serializable {
    def decodeImage(bytes: Array[Byte]): Array[Float] // feature vector
    def sampleFrames(bytes: Array[Byte], everyMs: Long, durationMs: Long): Seq[Array[Byte]]
  }

  /** Deterministic stand-in: features = normalized rolling byte statistics;
    * frames = byte-range slices. Replace with a real codec out of container. */
  object FakeCodec extends MediaCodec {
    def decodeImage(bytes: Array[Byte]): Array[Float] = {
      val dim = 16
      val acc = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { acc(i % dim) += (bytes(i) & 0xff) / 255.0f; i += 1 }
      val n = math.max(1, bytes.length / dim)
      acc.map(_ / n)
    }
    def sampleFrames(bytes: Array[Byte], everyMs: Long, durationMs: Long): Seq[Array[Byte]] = {
      val frames = math.max(1, (durationMs / math.max(1L, everyMs)).toInt)
      val step = math.max(1, bytes.length / frames)
      (0 until frames).map(i =>
        bytes.slice(i * step, math.min(bytes.length, (i + 1) * step)))
    }
  }

  /** Batched per-partition image feature extraction: binary -> Array[Float].
    * Runs as one iterator pass per partition (no per-row task overhead, no
    * shuffle); the decode call is the only stubbed step. */
  def extractImageFeatures(
      df: DataFrame,
      bytesCol: String,
      outCol: String = "features",
      codec: MediaCodec = FakeCodec): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType)))
    val bytesIdx = df.schema.fieldIndex(bytesCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](bytesIdx)
        val feats = if (bytes == null) null else codec.decodeImage(bytes)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling: one row per sampled frame (video -> image rows). */
  def sampleVideoFrames(
      df: DataFrame,
      bytesCol: String,
      metaCol: String,
      everyMs: Long,
      codec: MediaCodec = FakeCodec): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType), StructField("frame_bytes", BinaryType)))
    val bytesIdx = df.schema.fieldIndex(bytesCol)
    val metaIdx = df.schema.fieldIndex(metaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](bytesIdx)
        val meta = r.getAs[Row](metaIdx)
        val dur = if (meta == null || meta.isNullAt(meta.fieldIndex("duration_ms"))) 1000L
          else meta.getAs[Long]("duration_ms")
        if (bytes == null) Iterator.empty
        else codec.sampleFrames(bytes, everyMs, dur).zipWithIndex.iterator.map {
          case (fb, i) => Row.fromSeq(r.toSeq ++ Seq(i, fb))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Wrap a text table into a fake media table (test fixture helper). */
  def asMediaTable(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      encode(col(textCol), "UTF-8").as("content"),
      struct(lit("image").as("media_type"),
        (length(col(textCol)) % 640).cast("int").as("width"),
        (length(col(textCol)) % 480).cast("int").as("height"),
        (length(col(textCol)) * 10).cast("long").as("duration_ms"),
        lit("fake").as("codec")).as("meta"))
}
