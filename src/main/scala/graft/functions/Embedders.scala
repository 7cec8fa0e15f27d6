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
