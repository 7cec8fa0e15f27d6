package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns + typed metadata, with decode / feature-extract
  * / resize / frame-sample as batched `mapPartitions` stages (the Scala
  * analog of `mapInPandas` — one iterator per partition, work done in
  * batches so a real decoder could amortize model/codec setup per batch).
  *
  * The decode kernels are STUBS (no image/audio libs in this environment):
  * `FakeCodec` produces deterministic bytes-derived values so schema,
  * partitioning, batch shape and the end-to-end plumbing are real and
  * testable; swapping in a true codec only replaces the kernel body.
  */
object Multimodal {

  /** Canonical media-asset schema: opaque payload + typed metadata. */
  val AssetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("width", IntegerType),      // image/video
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType), // audio
    StructField("duration_ms", LongType)))   // audio/video

  val DefaultBatchSize = 64

  /** STUB decoder: deterministic pseudo-decode — a real implementation
    * would hand `payload` to an image/audio codec here. Emits a fixed-size
    * feature vector derived from the bytes (stable across runs). */
  object FakeCodec {
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val acc = new Array[Double](dim)
      var i = 0
      while (i < payload.length) {
        acc(i % dim) += (payload(i) & 0xff) / 255.0
        i += 1
      }
      val norm = math.sqrt(acc.map(x => x * x).sum)
      if (norm == 0) new Array[Float](dim)
      else acc.map(x => (x / norm).toFloat)
    }

    /** STUB resize: a real kernel would decode + scale; the fake keeps a
      * deterministic payload transform with the right output metadata. */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](math.min(payload.length, w * h))
      var i = 0
      while (i < out.length) { out(i) = payload(i); i += 1 }
      out
    }

    /** STUB frame sampler: byte-strided "frames" standing in for decoded
      * video frames at the given stride. */
    def sampleFrames(payload: Array[Byte], everyN: Int, frameBytes: Int): Seq[Array[Byte]] =
      payload.grouped(frameBytes).zipWithIndex
        .collect { case (f, i) if i % everyN == 0 => f }
        .toSeq
  }

  /** Batched feature extraction: partition iterator → fixed-size batches →
    * per-batch kernel (the mapInPandas batch shape). Output keeps the id +
    * a feature vector column. */
  def extractFeatures(assets: DataFrame, dim: Int = 64,
                      batchSize: Int = DefaultBatchSize): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val out = assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batch loop: a real decoder initializes its codec/model ONCE here
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, payload) => (id, FakeCodec.features(payload, dim)) }
        }
      }
    out.toDF("asset_id", "features")
  }

  /** Batched image resize with metadata update. */
  def resizeImages(assets: DataFrame, w: Int, h: Int,
                   batchSize: Int = DefaultBatchSize): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, p) =>
          (id, FakeCodec.resize(p, w, h), w, h)
        })
      }
      .toDF("asset_id", "payload", "width", "height")
  }

  /** Frame sampling: 1 video row → N frame rows (generator shape). */
  def sampleVideoFrames(assets: DataFrame, everyN: Int = 10,
                        frameBytes: Int = 256): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        FakeCodec.sampleFrames(p, everyN, frameBytes).zipWithIndex
          .map { case (f, i) => (id, i, f) }
      }
      .toDF("asset_id", "frame_index", "frame")
  }

  /** Build a deterministic synthetic asset table (for tests/demos):
    * payload bytes derived from the id. */
  def syntheticAssets(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val payload = Array.tabulate[Byte](128 + (i % 64))(j => ((i * 31 + j * 7) % 256).toByte)
      (i.toLong, if (i % 3 == 0) "image" else if (i % 3 == 1) "audio" else "video",
        payload)
    }.toDF("asset_id", "media_type", "payload")
  }
}
