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
