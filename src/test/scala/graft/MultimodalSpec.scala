package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("feature extraction: right schema, unit vectors, deterministic") {
    val assets = Multimodal.syntheticAssets(spark, 100).repartition(4)
    val feats = Multimodal.extractFeatures(assets, dim = 16, batchSize = 8)
    assert(feats.columns.toSeq == Seq("asset_id", "features"))
    val rows = feats.as[(Long, Array[Float])].collect().toMap
    assert(rows.size == 100)
    val norm = math.sqrt(rows(0L).map(x => x * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // determinism across runs
    val again = Multimodal.extractFeatures(assets, dim = 16, batchSize = 8)
      .as[(Long, Array[Float])].collect().toMap
    assert(rows(42L).toSeq == again(42L).toSeq)
  }

  test("resize updates payload and metadata") {
    val assets = Multimodal.syntheticAssets(spark, 10)
    val resized = Multimodal.resizeImages(assets, 8, 8)
    val r = resized.filter(col("asset_id") === 1).head()
    assert(r.getAs[Array[Byte]]("payload").length == 64)
    assert(r.getAs[Int]("width") == 8 && r.getAs[Int]("height") == 8)
  }

  test("frame sampling is a 1->N generator") {
    val assets = Multimodal.syntheticAssets(spark, 6)
    val frames = Multimodal.sampleVideoFrames(assets, everyN = 2, frameBytes = 32)
    assert(frames.columns.toSeq == Seq("asset_id", "frame_index", "frame"))
    val n = frames.filter(col("asset_id") === 0).count()
    // asset 0 payload = 128 bytes -> 4 frames of 32 -> every 2nd -> 2
    assert(n == 2)
  }
}
