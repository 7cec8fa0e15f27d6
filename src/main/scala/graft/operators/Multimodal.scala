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
  * IMAGE and AUDIO kernels are REAL (JDK-only: `javax.imageio` decode
  * for PNG/BMP/JPEG/GIF + `Graphics2D` nearest-neighbor resize;
  * `javax.sound.sampled` WAV/PCM decode) — see [[Multimodal.ImageCodec]]
  * and [[Multimodal.AudioCodec]]. VIDEO kernels remain STUBS (no video
  * codec ships with the JDK): `FakeCodec` produces deterministic
  * bytes-derived values so schema, partitioning, batch shape and the
  * end-to-end plumbing are real and testable; swapping in a true codec
  * only replaces the kernel body.
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
    * feature vector derived from the bytes (stable across runs).
    *
    * ==Video kernel: documented decision==
    * Image and audio decode are REAL (pure-JDK `ImageCodec`/`AudioCodec`,
    * oracle-checked by q45/q46); video stays a declared stub because no
    * video codec ships with the JDK and this build environment's
    * dependency set is frozen (no JCodec jar can be vendored). The
    * reference itself processes no video, so this is a forward-looking
    * seam only. Adoption recipe (org.jcodec:jcodec, BSD-2): replace
    * [[FakeCodec.sampleFrames]]'s body with
    * `FrameGrab.createFrameGrab(ByteBufferSeekableByteChannel.readFromByteBuffer(payload))`
    * keyframe iteration, keeping the exact signature and the batched
    * `mapPartitions` generator contract in [[sampleVideoFrames]] — schema,
    * batching, and the bad-record null path (q31) are already real and
    * stay unchanged. */
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

  /** REAL image kernel — pure JDK, works headless. Decode failures return
    * None (the bad-record path, P10): undecodable payloads become null
    * rows the caller filters, never task failures. */
  object ImageCodec {
    import java.awt.image.BufferedImage

    def decode(payload: Array[Byte]): Option[BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: Exception => None }

    /** Luminance histogram over `dim` bins, L2-normalized — a classic
      * cheap image feature with a fixed output shape. Deterministic:
      * integer luma binning over the decoded raster. */
    def features(payload: Array[Byte], dim: Int): Option[Array[Float]] =
      decode(payload).map(featuresOf(_, dim))

    /** Histogram from an already-decoded image (one decode per row). */
    def featuresOf(img: BufferedImage, dim: Int): Array[Float] = {
      val hist = new Array[Double](dim)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val luma = (299 * ((rgb >> 16) & 0xff) +
            587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
          hist(luma * dim / 256) += 1.0
          x += 1
        }
        y += 1
      }
      val norm = math.sqrt(hist.map(v => v * v).sum)
      if (norm == 0) new Array[Float](dim)
      else hist.map(v => (v / norm).toFloat)
    }

    /** Nearest-neighbor resize + PNG re-encode (both deterministic —
      * interpolation is pinned so no platform-dependent smoothing). */
    def resize(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      decode(payload).map { img =>
        val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }

    def dimensions(payload: Array[Byte]): Option[(Int, Int)] =
      decode(payload).map(img => (img.getWidth, img.getHeight))

    /** 64-bit average hash (aHash) — the classic perceptual image
      * fingerprint: integer BOX-downscale to an 8×8 grid (never
      * Graphics2D scaling — box sums are exact integers, so the hash is
      * platform-deterministic), per-cell mean gray ((r+g+b)/3 integer),
      * bit i (row-major, MSB first) set iff cell i's gray is STRICTLY
      * above the global mean. Near-duplicate images (re-encodes,
      * brightness shifts smaller than the cell contrast) keep their
      * hash; pairs then join on hash equality or small Hamming —
      * q42's SimHash posture carried to pixels. */
    def aHash(payload: Array[Byte]): Option[Long] =
      decode(payload).map(aHashOf)

    def aHashOf(img: BufferedImage): Long = {
      val w = img.getWidth
      val h = img.getHeight
      val cell = new Array[Double](64)
      var by = 0
      while (by < 8) {
        var bx = 0
        while (bx < 8) {
          val x0 = bx * w / 8; val x1 = math.max(x0 + 1, (bx + 1) * w / 8)
          val y0 = by * h / 8; val y1 = math.max(y0 + 1, (by + 1) * h / 8)
          var s = 0L; var n = 0
          var y = y0
          while (y < y1 && y < h) {
            var x = x0
            while (x < x1 && x < w) {
              val rgb = img.getRGB(x, y)
              s += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              n += 1; x += 1
            }
            y += 1
          }
          cell(by * 8 + bx) = if (n == 0) 0.0 else s.toDouble / n
          bx += 1
        }
        by += 1
      }
      val mean = cell.sum / 64.0
      var bits = 0L
      var i = 0
      while (i < 64) { if (cell(i) > mean) bits |= 1L << (63 - i); i += 1 }
      bits
    }
  }

  /** REAL audio kernel — JDK `javax.sound.sampled`, WAV/PCM. Decode
    * failures return None (bad-record path). */
  object AudioCodec {
    /** (sampleRate Hz, nFrames, 16-bit PCM samples channel-interleaved). */
    def decode(payload: Array[Byte]): Option[(Int, Long, Array[Short])] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          // Rate/length guards: a malformed header can declare rate <= 0,
          // and some streams report AudioSystem.NOT_SPECIFIED (-1) frame
          // length — either would surface as a crash or a negative
          // duration_ms downstream. Both are bad records, not task
          // failures.
          if (fmt.getSampleSizeInBits != 16 || fmt.getSampleRate.toInt <= 0 ||
              in.getFrameLength <= 0) None
          else {
            val bytes = in.readAllBytes()
            val bb = java.nio.ByteBuffer.wrap(bytes).order(
              if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
            val samples = new Array[Short](bytes.length / 2)
            var i = 0
            while (i < samples.length) { samples(i) = bb.getShort(i * 2); i += 1 }
            Some((fmt.getSampleRate.toInt, in.getFrameLength, samples))
          }
        } finally in.close()
      } catch { case _: Exception => None }

    /** Root-mean-square amplitude normalized to [0,1] (full scale =
      * 32768), accumulated sequentially in double — SQL-replicable for
      * synthesized fixtures. */
    def rms(payload: Array[Byte]): Option[Double] =
      decode(payload).map { case (_, _, samples) => rmsOf(samples) }

    /** 64-bit energy hash — [[ImageCodec.aHash]]'s audio sibling: the
      * sample stream box-split into 64 equal windows, per-window mean
      * ABSOLUTE amplitude (integer sums — exact), bit w (MSB first) set
      * iff window w's energy is strictly above the global mean.
      * Re-encodes and gain shifts smaller than the loud/quiet contrast
      * keep the hash; jingle/clip near-dups then join on equality. */
    def energyHash(payload: Array[Byte], nWin: Int = 64): Option[Long] =
      decode(payload).map { case (_, _, samples) => energyHashOf(samples, nWin) }

    def energyHashOf(samples: Array[Short], nWin: Int): Long = {
      // mirrors winnowFingerprints' loud-failure stance: nWin > 64 would
      // make `1L << (63 - i)` a negative shift, which the JVM masks
      // mod 64 — silently aliasing window bits onto wrong positions
      require(nWin >= 1 && nWin <= 64, s"nWin must be in [1, 64]: $nWin")
      if (samples.isEmpty) return 0L
      val e = new Array[Double](nWin)
      var w = 0
      while (w < nWin) {
        val i0 = w * samples.length / nWin
        val i1 = math.max(i0 + 1, (w + 1) * samples.length / nWin)
        var s = 0L; var n = 0; var i = i0
        while (i < i1 && i < samples.length) {
          s += math.abs(samples(i).toLong); n += 1; i += 1
        }
        e(w) = if (n == 0) 0.0 else s.toDouble / n
        w += 1
      }
      val mean = e.sum / nWin
      var bits = 0L
      var i = 0
      while (i < nWin) { if (e(i) > mean) bits |= 1L << (63 - i); i += 1 }
      bits
    }

    /** RMS from samples already decoded (avoids a second payload parse). */
    def rmsOf(samples: Array[Short]): Double =
      if (samples.isEmpty) 0.0
      else {
        var sum = 0.0
        var i = 0
        while (i < samples.length) {
          val v = samples(i) / 32768.0
          sum += v * v
          i += 1
        }
        math.sqrt(sum / samples.length)
      }

    /** Encode 16-bit mono PCM samples as a WAV container (fixture
      * builder — the inverse of [[decode]]). */
    def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(bb.putShort)
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  /** Batched REAL audio decode: sample rate, frame count, duration and
    * normalized RMS amplitude; undecodable rows → nulls. */
  def decodeAudio(assets: DataFrame,
                  batchSize: Int = DefaultBatchSize): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, payload) =>
          AudioCodec.decode(payload) match {
            case Some((rate, frames, samples)) =>
              (id, Some(rate), Some(frames),
                Some(frames * 1000L / rate), Some(AudioCodec.rmsOf(samples)))
            case None => (id, None, None, None, None)
          }
        })
      }
      .toDF("asset_id", "sample_rate", "n_frames", "duration_ms", "rms")
  }

  /** Batched REAL image decode + feature extraction: luminance-histogram
    * features with width/height metadata; undecodable rows surface as
    * nulls (filter = the bad-record path). */
  def decodeImages(assets: DataFrame, dim: Int = 64,
                   batchSize: Int = DefaultBatchSize): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, payload) =>
          ImageCodec.decode(payload) match {
            case Some(img) =>
              (id, Some(img.getWidth), Some(img.getHeight),
                Some(ImageCodec.featuresOf(img, dim)))
            case None => (id, None, None, None)
          }
        })
      }
      .toDF("asset_id", "width", "height", "features")
  }

  /** Batched REAL image resize (nearest-neighbor, PNG output). */
  def resizeImagesReal(assets: DataFrame, w: Int, h: Int,
                       batchSize: Int = DefaultBatchSize): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, p) =>
          (id, ImageCodec.resize(p, w, h), w, h)
        })
      }
      .toDF("asset_id", "payload", "width", "height")
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

  /** The q264/q268 asset fixture: render the doc's synthetic PNG (flip
    * family or boilerplate-pile pattern) and push it through the REAL
    * decode + aHash path. Every output bit is predictable from doc_id
    * arithmetic — the q258 construction with the pile override. */
  def syntheticAssetHash(id: Long): Long = {
    val bp = id % 7 == 0
    val fam = id / 4
    val m = (id % 4).toInt
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val bits60 = java.lang.Long.parseLong(
      md5hex(if (bp) "bpile" else s"bfam:$fam").substring(0, 15), 16)
    val base = java.lang.Integer.parseInt(md5hex(s"bpos:$fam").substring(0, 2), 16) % 56
    val nFlips = if (bp) 0 else if (m == 3) 4 else m
    val pattern = (0 until nFlips).foldLeft(bits60) { (acc, j) =>
      acc ^ (1L << ((base + 7 * j) % 56))
    }
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 64) {
      val bright = i >= 4 && ((pattern >> (59 - (i - 4))) & 1L) == 1L
      val v = if (bright) 200 + m else 40 + m
      img.setRGB(i % 8, i / 8, (v << 16) | (v << 8) | v)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    ImageCodec.aHash(bos.toByteArray).getOrElse(-1L)
  }
}
