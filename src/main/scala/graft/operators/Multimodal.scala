package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal asset plumbing (SURVEY.md north-star extension): treat
  * image/audio/video as opaque `binary` columns with typed metadata,
  * with decode / feature-extract / resize / frame-sample as
  * partition-local transforms.
  *
  * The actual codecs are NOT in this container, so the byte-level
  * decode is a clearly-marked deterministic stub ([[StubCodec]]) that
  * reads a tiny fake header; everything Spark-owned — schema, batch
  * iteration shape (iterator-to-iterator, never materializing a
  * partition), partitioning, explode fan-out — is real and tested.
  * Swapping [[StubCodec]] for a JNI/FFI codec changes no plan shape.
  */
object Multimodal {

  /** Asset table schema: id, modality tag, raw bytes, shallow metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("modality", StringType), // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("mime", StringType))))))

  /** Decoded-feature schema produced by [[decodeFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("modality", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("byte_len", LongType)))

  /** STUB codec boundary: parses the deterministic fake header
    * `[w:int16][h:int16][frames:int16]` big-endian from the first 6
    * bytes. A real implementation would hand `bytes` to an image/
    * audio/video library here — per-record, partition-local, no
    * change to the surrounding plan. */
  object StubCodec {
    def decodeHeader(bytes: Array[Byte]): (Int, Int, Int) = {
      def u16(i: Int): Int =
        ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
      if (bytes == null || bytes.length < 6) (0, 0, 0)
      else (u16(0), u16(2), u16(4))
    }

    def encodeHeader(w: Int, h: Int, frames: Int, payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](6 + payload.length)
      out(0) = (w >> 8).toByte; out(1) = w.toByte
      out(2) = (h >> 8).toByte; out(3) = h.toByte
      out(4) = (frames >> 8).toByte; out(5) = frames.toByte
      System.arraycopy(payload, 0, out, 6, payload.length)
      out
    }
  }

  /** Decode shallow features from the binary column. mapPartitions
    * with an iterator-to-iterator body: constant memory per partition
    * regardless of asset size — the shape that survives 100 TB of
    * video. */
  def decodeFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "modality", "bytes").rdd
      .mapPartitions(_.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val (w, h, f) = StubCodec.decodeHeader(bytes)
        Row(r.getAs[Long]("asset_id"), r.getAs[String]("modality"),
          w, h, f, if (bytes == null) 0L else bytes.length.toLong)
      })
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame sampling: one output row per sampled frame index —
    * `posexplode` fan-out on a sequence bounded by the decoded frame
    * count, `stride` frames apart. The explode happens before any
    * shuffle so downstream repartitioning sees frame-level rows. */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features
      .where(col("n_frames") > 0)
      .select(col("asset_id"),
        posexplode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .withColumnRenamed("pos", "sample_idx")
      .withColumnRenamed("col", "frame_idx")

  /** "Resize": recompute header dims scaled by `factor` (stub for a
    * real pixel transform; demonstrates binary-in/binary-out). Same
    * iterator-to-iterator codec-boundary shape as [[decodeFeatures]] —
    * per-record, partition-local, constant memory, no closure UDF. */
  def resize(assets: DataFrame, factor: Double): DataFrame = {
    val spark = assets.sparkSession
    val schema = assets.schema
    val idx = schema.fieldIndex("bytes")
    val rdd = assets.rdd.mapPartitions(_.map { r =>
      val bytes = r.getAs[Array[Byte]](idx)
      val out =
        if (bytes == null || bytes.length < 6) bytes
        else {
          val (w, h, f) = StubCodec.decodeHeader(bytes)
          StubCodec.encodeHeader((w * factor).toInt, (h * factor).toInt, f,
            bytes.drop(6))
        }
      Row.fromSeq(r.toSeq.updated(idx, out))
    })
    spark.createDataFrame(rdd, schema)
  }

  /** Synthesize a deterministic asset table for tests/demos. */
  def syntheticAssets(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val w = 64 + (i % 8) * 16
      val h = 48 + (i % 5) * 16
      val frames = if (i % 3 == 2) 24 + i % 10 else 1
      val payload = Array.tabulate[Byte](32)(j => ((i * 31 + j) % 127).toByte)
      Row(i.toLong,
        Seq("image", "audio", "video")(i % 3),
        StubCodec.encodeHeader(w, h, frames, payload),
        Row(s"src${i % 4}", Seq("image/png", "audio/wav", "video/mp4")(i % 3)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), assetSchema)
  }
}
