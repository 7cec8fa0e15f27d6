package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("aHash: bit layout, box-downscale invariance, jitter invariance, contrast sensitivity") {
    import java.awt.image.BufferedImage
    def png(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    def mk(scale: Int, jitter: Int, brightBit: Int => Boolean): BufferedImage = {
      val img = new BufferedImage(8 * scale, 8 * scale, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8 * scale; x <- 0 until 8 * scale) {
        val i = (y / scale) * 8 + (x / scale)
        val v = (if (brightBit(i)) 200 else 40) + jitter
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    // single bright pixel at cell 0 => only the MSB set
    val one = Multimodal.ImageCodec.aHashOf(mk(1, 0, _ == 0))
    assert(one == (1L << 63))
    // 2x box-downscaled magnification hashes identically (exact box sums)
    val pattern = (i: Int) => (i * 2654435761L & 1L) == 1L
    val base = Multimodal.ImageCodec.aHashOf(mk(1, 0, pattern))
    assert(Multimodal.ImageCodec.aHashOf(mk(2, 0, pattern)) == base)
    // exposure jitter below the cell contrast never flips a bit
    assert(Multimodal.ImageCodec.aHashOf(mk(1, 3, pattern)) == base)
    // a structural change DOES flip: invert one cell of the pattern
    val flipped = Multimodal.ImageCodec.aHashOf(mk(1, 0, i => pattern(i) ^ (i == 9)))
    assert(flipped != base)
    // decode path end-to-end (PNG roundtrip is lossless for TYPE_INT_RGB)
    assert(Multimodal.ImageCodec.aHash(png(mk(1, 0, pattern))).contains(base))
  }

  test("energyHash: window layout, gain invariance, WAV roundtrip, structure sensitivity") {
    def mk(gain: Int, loudBit: Int => Boolean): Array[Short] = {
      val s = new Array[Short](64 * 50)
      for (w <- 0 until 64; i <- 0 until 50)
        s(w * 50 + i) = ((if (loudBit(w)) 4096 else 256) + gain).toShort
      s
    }
    val pattern = (w: Int) => (w * 2654435761L & 1L) == 1L
    val base = Multimodal.AudioCodec.energyHashOf(mk(0, pattern), 64)
    // one loud window => one bit, MSB-first layout
    assert(Multimodal.AudioCodec.energyHashOf(mk(0, _ == 0), 64) == (1L << 63))
    // gain shift below the loud/quiet contrast never flips a bit
    assert(Multimodal.AudioCodec.energyHashOf(mk(48, pattern), 64) == base)
    // structural change flips
    assert(Multimodal.AudioCodec.energyHashOf(
      mk(0, w => pattern(w) ^ (w == 9)), 64) != base)
    // full WAV encode/decode path preserves the hash (PCM16 lossless)
    val wav = Multimodal.AudioCodec.encodeWav(mk(0, pattern), 8000)
    assert(Multimodal.AudioCodec.energyHash(wav).contains(base))
  }

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

  test("real image kernel: decode, histogram features, resize, bad-record path") {
    import java.awt.image.BufferedImage
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    import spark.implicits._
    val assets = Seq(
      (0L, png(16, 12, 0x000000)),          // all black -> luma 0
      (1L, png(16, 12, 0xffffff)),          // all white -> luma 255
      (2L, "not an image".getBytes("UTF-8")) // undecodable
    ).toDF("asset_id", "payload")

    val decoded = Multimodal.decodeImages(assets, dim = 64)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(decoded(0L).getAs[Integer]("width") == 16 &&
      decoded(0L).getAs[Integer]("height") == 12)
    val black = decoded(0L).getAs[scala.collection.Seq[Float]]("features")
    val white = decoded(1L).getAs[scala.collection.Seq[Float]]("features")
    assert(black.head == 1.0f && black.drop(1).forall(_ == 0.0f)) // all mass in bin 0
    assert(white.last == 1.0f && white.init.forall(_ == 0.0f))    // all mass in bin 63
    assert(decoded(2L).isNullAt(1) && decoded(2L).isNullAt(3))    // bad record -> nulls

    val resized = Multimodal.resizeImagesReal(assets, 4, 4)
      .filter(col("asset_id") === 1).head()
    val back = Multimodal.ImageCodec.dimensions(
      resized.getAs[Array[Byte]]("payload"))
    assert(back.contains((4, 4))) // re-encoded PNG round-trips at the new size
  }

  test("real audio kernel: WAV round-trip, RMS, bad-record path") {
    import spark.implicits._
    val wav = Multimodal.AudioCodec.encodeWav(Array.fill(1600)(1024.toShort), 8000)
    val assets = Seq(
      (0L, wav),
      (1L, "not audio".getBytes("UTF-8"))
    ).toDF("asset_id", "payload")
    val out = Multimodal.decodeAudio(assets).collect()
      .map(r => r.getLong(0) -> r).toMap
    val ok = out(0L)
    assert(ok.getAs[Integer]("sample_rate") == 8000)
    assert(ok.getAs[Long]("n_frames") == 1600L)
    assert(ok.getAs[Long]("duration_ms") == 200L)
    assert(ok.getAs[Double]("rms") == 1024.0 / 32768) // constant power-of-two amp: exact
    assert(out(1L).isNullAt(1) && out(1L).isNullAt(4)) // undecodable -> nulls
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
