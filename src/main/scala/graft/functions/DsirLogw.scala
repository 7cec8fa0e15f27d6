package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `dsir_logw(text, lr)`: the DSIR importance log-weight in ONE pass —
  * tokenize, hash every word unigram then bigram into `lr.length`
  * buckets (first 8 hex chars of md5, the engine's oracle idiom), and
  * accumulate `Σ lr[bucket(f)]` in feature order (unigrams in document
  * order, then bigrams). Returns `struct(logw double, n_features long)`.
  *
  * This is the [[MinhashSigs]] treatment applied to the DSIR scoring
  * pass. The composed form — a higher-order `aggregate` over a
  * `concat(tokens, bigrams)` array with `element_at` on a 256-entry MAP
  * column — evaluated interpreted AND paid a linear scan of the map per
  * feature (Catalyst map lookup is O(entries)): ~256 comparisons × every
  * feature × every document, measured 31.9 s for the sf0.1 corpus. One
  * digest + one array index per feature brings the same arithmetic to
  * scan speed. The accumulation order and IEEE op sequence are identical
  * to the old fold, so the DuckDB oracle replay is unchanged.
  *
  * The log-ratio table is a foldable `array<double>` literal indexed by
  * bucket — every bucket is present by [[graft.operators.Dsir.hashedLm]]
  * construction (add-1 smoothing has no OOV path). */
case class DsirLogw(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("logw", DoubleType, nullable = false),
    StructField("n_features", LongType, nullable = false)))
  override def prettyName: String = "dsir_logw"

  @transient private lazy val lr: Array[Double] = right match {
    case Literal(v: ArrayData, ArrayType(DoubleType, _)) if v != null =>
      v.toDoubleArray()
    case other => throw new IllegalArgumentException(
      s"dsir_logw needs a foldable array<double> log-ratio literal, got $other")
  }

  override def nullSafeEval(text: Any, lrAny: Any): Any = {
    val buckets = lr.length
    val raw = text.asInstanceOf[UTF8String].toString
      .trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val toks = raw.filter(_.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def ratioOf(f: String): Double = {
      md.reset()
      val d = md.digest(f.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // First 8 hex chars big-endian == first 4 digest bytes as uint32.
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      lr((h % buckets).toInt)
    }
    var acc = 0.0
    var i = 0
    while (i < toks.length) { acc += ratioOf(toks(i)); i += 1 }
    i = 0
    while (i < toks.length - 1) {
      acc += ratioOf(toks(i) + " " + toks(i + 1))
      i += 1
    }
    val n = toks.length.toLong + math.max(0L, toks.length.toLong - 1L)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](acc, n))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DsirLogw =
    copy(left = newLeft, right = newRight)
}

/** `dsir_dot(text, w)`: the trained-quality-classifier logit's linear
  * part in ONE pass — build the [[DsirBucketCounts]] histogram
  * (`w.length` buckets, same tokenizer + digest) into a primitive
  * `long[]`, then fold `Σ_b hist[b]·w[b]` as a strict left fold in
  * bucket index order. That is bit-for-bit the composed
  * `aggregate(zip_with(dsir_buckets(text), w, …))` accumulation (and
  * the DuckDB oracle's bucket-order fold), without the interpreted
  * zip_with/aggregate lambdas per row — the q81 pathology at 256
  * elements per document. The intercept stays outside (one codegen
  * add), so the weights literal is the only model state here. */
case class DsirBucketDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dsir_dot"

  @transient private lazy val w: Array[Double] = right match {
    case Literal(v: ArrayData, ArrayType(DoubleType, _)) if v != null =>
      v.toDoubleArray()
    case other => throw new IllegalArgumentException(
      s"dsir_dot needs a foldable array<double> weights literal, got $other")
  }

  override def nullSafeEval(text: Any, wAny: Any): Any = {
    val buckets = w.length
    val counts = DsirFeatures.bucketHistogram(
      text.asInstanceOf[UTF8String], buckets)
    var acc = 0.0
    var i = 0
    while (i < buckets) { acc += counts(i).toDouble * w(i); i += 1 }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DsirBucketDot =
    copy(left = newLeft, right = newRight)
}

/** The one definition of the DSIR hashed-feature pipeline shared by the
  * histogram kernels: trim/lower/`\s+` tokenization, word unigrams then
  * adjacent bigrams, bucket = first 4 md5 bytes big-endian mod
  * `buckets`. q94's gate depends on `dsir_dot` and `dsir_buckets`
  * computing IDENTICAL histograms — one body keeps that structural. */
private[functions] object DsirFeatures {
  def bucketHistogram(text: UTF8String, buckets: Int): Array[Long] = {
    val counts = new Array[Long](buckets)
    val raw = text.toString
      .trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val toks = raw.filter(_.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucketOf(f: String): Int = {
      md.reset()
      val d = md.digest(f.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (h % buckets).toInt
    }
    var i = 0
    while (i < toks.length) { counts(bucketOf(toks(i))) += 1L; i += 1 }
    i = 0
    while (i < toks.length - 1) {
      counts(bucketOf(toks(i) + " " + toks(i + 1))) += 1L
      i += 1
    }
    counts
  }
}

/** `dsir_buckets(text, buckets)`: per-document hashed-feature bucket
  * histogram in ONE pass — the [[DsirLogw]] tokenizer and digest
  * (unigrams then bigrams, first 4 md5 bytes big-endian mod `buckets`)
  * accumulating counts into a primitive `long[buckets]`. Returns
  * `array<long>` of length `buckets`; position IS the bucket id, so the
  * LM-fit aggregation downstream is `posexplode` + sum with no
  * per-feature expression work at all.
  *
  * This is the fit-side twin of the scoring kernel: the composed form
  * (`explode(features(text))` → Catalyst `md5`/`conv`/`substring` per
  * exploded feature → groupBy) re-materialized every feature as a row
  * and paid the full expression stack per feature — measured 521 s for
  * one fit over the 250k-doc probe corpus where this kernel's scan
  * shape does the same digest work in under a second per scan
  * (BASELINE.md round-8 selection probe). Bucket counts are integers,
  * so aggregation order cannot affect the oracle. */
case class DsirBucketCounts(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dsir_buckets"

  @transient private lazy val buckets: Int = right match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"dsir_buckets needs a foldable int bucket count, got $other")
  }

  override def nullSafeEval(text: Any, bucketsAny: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      DsirFeatures.bucketHistogram(text.asInstanceOf[UTF8String], buckets))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DsirBucketCounts =
    copy(left = newLeft, right = newRight)
}
