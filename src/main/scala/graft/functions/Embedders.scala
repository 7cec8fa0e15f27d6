package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch embedding with the model-backed execution shape (SURVEY §2.9 E1,
  * `components/core/embedding_service.py:64-105`): `mapPartitions` with a
  * per-partition encoder instance and fixed-size batches (`batch_size: 256`
  * parity) — the lifecycle a real ONNX/JNI sentence-transformer needs
  * (init once per partition, encode in batches). The default encoder is the
  * deterministic [[HashEmbedder]]; swapping in a model only replaces
  * `makeEncoder`. Dimension is validated against the encoder output exactly
  * like `embedding_service.py:46-55`.
  *
  * ==Model-backed encoder: documented decision==
  * The reference's semantic quality comes from sentence-transformers
  * (`embedding_service.py:39-105`, 768-d). This build environment has a
  * frozen dependency set (no ONNX Runtime jar, no model artifact can be
  * hosted), so the model-backed kernel is deliberately NOT shipped; the
  * hashing encoder remains the hermetic default that every oracle pins.
  * The integration seam is exactly `makeEncoder: () => Encoder`:
  * {{{
  * // e.g. with com.microsoft.onnxruntime:onnxruntime (Apache-2.0):
  * def onnxEncoder(modelPath: String, dim: Int): () => Encoder = () => new Encoder {
  *   // per-partition: OrtEnvironment + OrtSession created ONCE here
  *   // (executors resolve modelPath via SparkFiles.get / a shared mount)
  *   def encodeBatch(texts: Seq[String]): Seq[Array[Float]] =
  *     ??? // tokenize -> run session batch -> mean-pool -> L2-normalize
  * }
  * Embedders.embedPartitioned(docs, "text", "doc_id", dim = 768,
  *   makeEncoder = Some(onnxEncoder("/models/sbert.onnx", 768)))
  * }}}
  * Everything else — batching, per-partition init amortization, dimension
  * validation, the q35-pinned execution shape — is already exercised by
  * the hashing default, so only `encodeBatch`'s body changes at adoption.
  * The artifact side of that lifecycle (driver-side model file,
  * executor-side lazy load once per partition, batched matmul) is
  * exercised for real by [[linearEncoder]]/[[saveLinearWeights]].
  */
object Embedders {
  val DefaultBatchSize = 256

  /** An encoder instance: batch of texts → batch of vectors. */
  trait Encoder extends Serializable {
    def encodeBatch(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Default hermetic encoder (one "instance" per partition, mirroring
    * model init cost amortization). */
  def hashingEncoder(dim: Int): () => Encoder = () => new Encoder {
    def encodeBatch(texts: Seq[String]): Seq[Array[Float]] =
      texts.map(HashEmbedder.embed(_, dim))
  }

  /** Weight-file-backed LINEAR encoder — the model-artifact lifecycle of
    * the ONNX seam (driver-side artifact, executor-side load once per
    * partition, batched matrix multiply) exercised end-to-end with a
    * public algorithm: hashed bag-of-words × W, L2-normalized (random
    * projection of term counts — Achlioptas-style dense variant). The
    * artifact is a plain text file (`outDim inDim` header, then one row
    * of floats per output dimension) readable from any shared mount — or
    * a `resource:/…` classpath entry, which ships inside the application
    * jar exactly as a small model would. Swap the matmul body for an
    * OrtSession call and this IS the ONNX integration, artifact plumbing
    * included.
    *
    * Every arithmetic step is cross-engine replayable (q62 pins the full
    * vectors against a DuckDB matmul replay): the token bucket is an md5
    * slice (first 16 bits mod inDim — the [[HashEmbedder]] idiom, not a
    * JVM-private hashCode), products accumulate in DOUBLE (each term an
    * exact small-integer multiple of the float32 weight, so the sum is
    * order-independent), and each component rounds to float32 once. */
  def linearEncoder(weightsPath: String): () => Encoder = () => new Encoder {
    // Loaded lazily ONCE per partition (the model-load analog); executors
    // read from a shared path exactly as they would a mounted model file.
    private lazy val (outDim, inDim, w) = loadLinearWeights(weightsPath)
    private lazy val md = java.security.MessageDigest.getInstance("MD5")
    def encodeBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      val x = new Array[Double](inDim)
      t.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
        .filter(_.nonEmpty)
        .foreach { tok =>
          md.reset()
          val d = md.digest(tok.getBytes("UTF-8"))
          x((((d(0) & 0xff) << 8) | (d(1) & 0xff)) % inDim) += 1.0
        }
      val out = new Array[Float](outDim)
      var o = 0
      while (o < outDim) {
        var acc = 0.0; var i = 0
        val row = w(o)
        while (i < inDim) { acc += row(i).toDouble * x(i); i += 1 }
        out(o) = acc.toFloat; o += 1
      }
      val n = math.sqrt(out.map(v => v * v.toDouble).sum)
      if (n == 0) out else out.map(v => (v / n).toFloat)
    }
  }

  /** Deterministic ±1/sqrt(outDim) random-projection weights, persisted as
    * the model artifact `linearEncoder` loads (md5-derived like the LSH
    * hyperplanes, so regeneration is reproducible). */
  def saveLinearWeights(outDim: Int, inDim: Int, path: String): Unit = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val scale = (1.0 / math.sqrt(outDim)).toFloat
    val pw = new java.io.PrintWriter(
      new java.io.File(path), java.nio.charset.StandardCharsets.UTF_8)
    try {
      pw.println(s"$outDim $inDim")
      (0 until outDim).foreach { o =>
        pw.println((0 until inDim).map { i =>
          md.reset()
          val d = md.digest(s"lw:$o:$i".getBytes("UTF-8"))
          if (((d(0) >> 4) & 0xf) < 8) scale else -scale
        }.mkString(" "))
      }
    } finally pw.close()
  }

  private def loadLinearWeights(path: String): (Int, Int, Array[Array[Float]]) = {
    val src =
      if (path.startsWith("resource:")) {
        val name = path.stripPrefix("resource:")
        val in = getClass.getResourceAsStream(name)
        require(in != null, s"weight resource $name not on the classpath")
        scala.io.Source.fromInputStream(in, "UTF-8")
      } else scala.io.Source.fromFile(path, "UTF-8")
    try {
      val lines = src.getLines()
      val Array(outDim, inDim) = lines.next().split(" ").map(_.toInt)
      val w = lines.take(outDim).map(_.split(" ").map(_.toFloat)).toArray
      require(w.length == outDim && w.forall(_.length == inDim),
        s"weight file $path does not match its $outDim x $inDim header")
      (outDim, inDim, w)
    } finally src.close()
  }

  /** Embed `textCol` into an `embedding` column via per-partition batches.
    * Output schema: input columns (id kept by caller) + embedding. */
  def embedPartitioned(df: DataFrame, textCol: String, idCol: String,
                       dim: Int = HashEmbedder.DefaultDim,
                       batchSize: Int = DefaultBatchSize,
                       makeEncoder: Option[() => Encoder] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mk = makeEncoder.getOrElse(hashingEncoder(dim))
    val out = df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val encoder = mk() // once per partition — model-load analog
        it.grouped(batchSize).flatMap { batch =>
          val vecs = encoder.encodeBatch(batch.map(_._2))
          require(vecs.forall(_.length == dim),
            s"encoder dimension mismatch: expected $dim") // dim validation parity
          batch.map(_._1).zip(vecs)
        }
      }
    out.toDF(idCol, "embedding")
  }
}
