package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines. Media is carried as opaque `binary` columns plus a typed
  * metadata struct (the lakehouse pattern: bytes in parquet, features as
  * columns).
  *
  * The codec boundary is [[MediaCodec]]. Binary PPM (P6) images get a REAL
  * pure-JVM decoder ([[PpmCodec]]: header parse + per-channel mean/std +
  * 2x2 brightness grid — no library needed); library-bound formats (JPEG
  * decode, audio resample, video frame-grab) are STUBBED with a
  * deterministic byte-level fake — those libraries are not available in
  * this environment. Everything Spark-side is real and tested: the schema,
  * the per-partition batched processing shape (mapPartitions over an
  * iterator, the Scala analogue of mapInPandas batches),
  * partition-parallel feature extraction, and the frame-sampling
  * row-explosion.
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

  /** REAL image decoder for binary PPM (P6) — the raster format that needs
    * no codec library: header `P6\n<w> <h>\n<maxval>\n` followed by raw RGB
    * triplets. Features: per-channel means, per-channel stddevs, and a 2x2
    * per-cell mean brightness grid (10 dims). Non-PPM bytes fall back to
    * `fallback` (the deterministic stub for library-bound formats —
    * JPEG/PNG/audio/video stay stubbed, documented). */
  class PpmCodec(fallback: MediaCodec = FakeCodec) extends MediaCodec {
    def decodeImage(bytes: Array[Byte]): Array[Float] = {
      val parsed = PpmCodec.parse(bytes)
      if (parsed == null) return fallback.decodeImage(bytes)
      val (w, h, off) = parsed
      val sum = new Array[Double](3); val sq = new Array[Double](3)
      val grid = new Array[Double](4); val gridN = new Array[Long](4)
      var p = 0
      val n = w.toLong * h
      while (p < n) {
        val x = (p % w).toInt; val y = (p / w).toInt
        val i = off + p.toInt * 3
        var lum = 0.0
        var c = 0
        while (c < 3) {
          val v = (bytes(i + c) & 0xff) / 255.0
          sum(c) += v; sq(c) += v * v; lum += v / 3.0; c += 1
        }
        val cell = (if (2 * y >= h) 2 else 0) + (if (2 * x >= w) 1 else 0)
        grid(cell) += lum; gridN(cell) += 1
        p += 1
      }
      val out = new Array[Float](10)
      var c = 0
      while (c < 3) {
        val m = sum(c) / n
        out(c) = m.toFloat
        out(3 + c) = math.sqrt(math.max(0.0, sq(c) / n - m * m)).toFloat
        c += 1
      }
      var g = 0
      while (g < 4) {
        out(6 + g) = (if (gridN(g) == 0) 0.0 else grid(g) / gridN(g)).toFloat
        g += 1
      }
      out
    }
    def sampleFrames(bytes: Array[Byte], everyMs: Long, durationMs: Long): Seq[Array[Byte]] =
      fallback.sampleFrames(bytes, everyMs, durationMs) // video stays stubbed
  }

  object PpmCodec {
    /** (width, height, pixelOffset) or null if not P6 / truncated. */
    def parse(bytes: Array[Byte]): (Int, Int, Int) = {
      if (bytes == null || bytes.length < 11 ||
        bytes(0) != 'P' || bytes(1) != '6') return null
      var i = 2
      val fields = new Array[Int](3)
      var f = 0
      while (f < 3) {
        while (i < bytes.length &&
          (bytes(i) == ' ' || bytes(i) == '\n' || bytes(i) == '\t' ||
            bytes(i) == '\r')) i += 1
        var v = 0L; var any = false
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
          v = v * 10 + (bytes(i) - '0'); any = true; i += 1
        }
        if (!any || v <= 0 || v > Int.MaxValue) return null
        fields(f) = v.toInt; f += 1
      }
      i += 1 // single whitespace after maxval
      val (w, h) = (fields(0), fields(1))
      // only 1-byte-per-sample maxval=255 is supported: maxval>255 means
      // 2-byte samples (the length check alone could misparse a long file),
      // and maxval<255 would need /maxval normalization downstream
      if (fields(2) != 255) return null
      if (bytes.length < i + 3L * w * h) null else (w, h, i)
    }

    /** Deterministic synthetic P6 image (test/fixture generator — pure JVM,
      * xorshift-filled pixels keyed by `seed`). */
    def synthetic(w: Int, h: Int, seed: Long): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + 3 * w * h)
      System.arraycopy(header, 0, out, 0, header.length)
      var s = seed * 0x9E3779B97F4A7C15L + 1
      var i = header.length
      while (i < out.length) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        out(i) = (s & 0xff).toByte
        i += 1
      }
      out
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

  /** REAL-media fixture: one deterministic P6 (PPM) image per row — bytes
    * generated pure-JVM ([[PpmCodec.synthetic]]), decodable by [[PpmCodec]]
    * with no codec library. Width/height derive from the id. */
  def asPpmMediaTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("content", BinaryType),
      StructField("meta", mediaMetaType)))
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getAs[Number](idIdx).longValue()
        val w = 8 + (id % 8).toInt
        val h = 8 + (id % 5).toInt
        Row(r.get(idIdx), PpmCodec.synthetic(w, h, id),
          Row("image", w, h, 0L, "ppm"))
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
