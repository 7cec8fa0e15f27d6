package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Deterministic feature-hashing text embedder.
  *
  * Stand-in for the reference's sentence-transformers encoder
  * (`components/core/embedding_service.py:64-105`, 768-d, L2-normalized
  * float32): same contract — fixed dimension, normalized float32, batch
  * friendly — but hermetic (no model weights, no network) so test vectors
  * are reproducible. Features: lowercased word unigrams + bigrams, signed
  * hashing-trick into `dim` buckets, then L2 normalization, mirroring the
  * normalize-at-encode-time convention that makes inner product == cosine
  * (`components/core/embedding_service.py:92-96`).
  *
  * The feature hash is MD5 (not a JVM-private hash): the bucket is the
  * first two digest bytes mod `dim`, the sign is the top bit of the third
  * byte. MD5 hex agrees across engines, so a SQL oracle (DuckDB `md5`)
  * can replicate every vector bit-for-bit — the same choice the minhash
  * pipeline makes (`Dedup`), making embedding-derived query results
  * hash-checkable instead of rows-only.
  */
object HashEmbedder {
  val DefaultDim = 64

  def embed(text: String, dim: Int = DefaultDim): Array[Float] = {
    val acc = new Array[Double](dim)
    if (text != null) {
      val md = MessageDigest.getInstance("MD5")
      val tokens = text.toLowerCase(java.util.Locale.ROOT).split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
      var i = 0
      while (i < tokens.length) {
        addFeature(md, acc, tokens(i), dim)
        if (i + 1 < tokens.length) addFeature(md, acc, tokens(i) + " " + tokens(i + 1), dim)
        i += 1
      }
    }
    var sum = 0.0
    var j = 0
    while (j < dim) { sum += acc(j) * acc(j); j += 1 }
    val norm = math.sqrt(sum)
    val out = new Array[Float](dim)
    j = 0
    if (norm > 0) {
      while (j < dim) { out(j) = (acc(j) / norm).toFloat; j += 1 }
    }
    out
  }

  private def addFeature(md: MessageDigest, acc: Array[Double], feature: String, dim: Int): Unit = {
    md.reset()
    val h = md.digest(feature.getBytes(StandardCharsets.UTF_8))
    // First 16 bits -> bucket, top bit of byte 2 -> sign; both derivable
    // from the md5 hex prefix in SQL (see SparkEntry's embedding oracle).
    val idx = (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % dim
    val sign = if ((h(2) & 0x80) == 0) 1.0 else -1.0
    acc(idx) += sign
  }
}

/** `hash_embed(text, dim)` as a Catalyst expression (ingest-time, so
  * interpreted eval suffices). */
case class HashEmbedExpression(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "hash_embed"

  override def nullSafeEval(text: Any, dim: Any): Any = {
    val s = text.asInstanceOf[UTF8String].toString
    new GenericArrayData(HashEmbedder.embed(s, dim.asInstanceOf[Int]))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HashEmbedExpression =
    copy(left = newLeft, right = newRight)
}
