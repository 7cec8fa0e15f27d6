package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_sigs(text, n, bands)`: per-document MinHash band signatures in a
  * single pass — the signature for band `b` is the minimum of
  * `substr(md5(shingle), b*w+1, w)` over the document's word n-gram
  * shingles, where `w = 32/bands` hex chars.
  *
  * This replaces the explode → groupBy(id) → `min(md5(b || ':' || shingle))`
  * pipeline stage: one md5 per shingle instead of one per (shingle, band),
  * and zero shuffle — the signatures come out as a per-row array, so at
  * 100 TB the LSH stage is a narrow map over the corpus scan. Disjoint
  * hex slices of one md5 digest serve as the `bands` independent hash
  * families (32 bits per band at bands=4 — ample for min-hashing).
  *
  * Cross-engine deterministic: DuckDB reproduces each signature as
  * `min(substr(md5(shingle), b*8 + 1, 8))`, so LSH candidate generation is
  * oracle-checkable (reference near-dup behavior anchor:
  * `components/core/index_service.py` stores exact vectors; near-dup is an
  * engine extension for training-data pipelines).
  *
  * Returns an empty array when the document has fewer than `n` tokens
  * (no shingles → the doc can never appear in a candidate pair).
  */
case class MinhashSigs(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(text: Any, nAny: Any, bandsAny: Any): Any = {
    val n = nAny.asInstanceOf[Int]
    val bands = bandsAny.asInstanceOf[Int]
    // Registered as a session SQL function — fail fast with a clear
    // message instead of a per-row StringIndexOutOfBounds (bands > 32
    // would slice past the 32-char md5 hex) or a division error.
    if (bands < 1 || bands > 32)
      throw new IllegalArgumentException(
        s"minhash_sigs: bands must be in [1, 32] (32-hex-char md5 digest), got $bands")
    if (n < 1)
      throw new IllegalArgumentException(
        s"minhash_sigs: shingle size n must be >= 1, got $n")
    val toks = text.asInstanceOf[UTF8String].toString
      .trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val width = math.max(1, 32 / bands)
    val mins = new Array[String](bands)
    // One digest instance per row, reset per shingle (getInstance is a JCA
    // provider lookup — too costly per shingle).
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      md.reset()
      val hex = MinhashSigs.hex(
        md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      var b = 0
      while (b < bands) {
        val slice = hex.substring(b * width, b * width + width)
        if (mins(b) == null || slice.compareTo(mins(b)) < 0) mins(b) = slice
        b += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(s => UTF8String.fromString(s): Any))
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinhashSigs =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `minhash_sigs_multi(text, n, band_counts)`: [[MinhashSigs]] for SEVERAL
  * band counts in ONE md5 pass — the signature source for banding SWEEPS
  * (q178/q197), where the per-leg single-width form would digest every
  * shingle once per leg. Returns the concatenation of the per-band-count
  * signature arrays in `band_counts` order (leg `i`'s `band_counts(i)`
  * signatures start at offset `Σ_{j<i} band_counts(j)`, sliced out by the
  * caller); each slice is bit-identical to `minhash_sigs(text, n,
  * band_counts(i))` (MinhashPropSpec pins the equivalence), so per-leg
  * oracles are unchanged. Empty array when the document has < n tokens,
  * like the single-width form. */
case class MinhashSigsMulti(first: Expression, second: Expression,
                            third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sigs_multi"

  override def nullSafeEval(text: Any, nAny: Any, bandCountsAny: Any): Any = {
    val n = nAny.asInstanceOf[Int]
    val bcData = bandCountsAny.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val bandCounts = bcData.toIntArray()
    if (bandCounts.isEmpty || bandCounts.exists(b => b < 1 || b > 32))
      throw new IllegalArgumentException(
        s"minhash_sigs_multi: every band count must be in [1, 32], got ${bandCounts.mkString(",")}")
    if (n < 1)
      throw new IllegalArgumentException(
        s"minhash_sigs_multi: shingle size n must be >= 1, got $n")
    val toks = text.asInstanceOf[UTF8String].toString
      .trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val total = bandCounts.sum
    val widths = bandCounts.map(b => math.max(1, 32 / b))
    val offsets = bandCounts.scanLeft(0)(_ + _)
    val mins = new Array[String](total)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      md.reset()
      val hex = MinhashSigs.hex(
        md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      var li = 0
      while (li < bandCounts.length) {
        val width = widths(li)
        val base = offsets(li)
        var b = 0
        while (b < bandCounts(li)) {
          val slice = hex.substring(b * width, b * width + width)
          val k = base + b
          if (mins(k) == null || slice.compareTo(mins(k)) < 0) mins(k) = slice
          b += 1
        }
        li += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(s => UTF8String.fromString(s): Any))
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): MinhashSigsMulti =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object MinhashSigs {
  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex of a digest — identical to Spark's and DuckDB's `md5`
    * output encoding. */
  def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = HexChars((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}

/** `strip_non_alnum(s)`: drop every byte outside `[a-z0-9]` — the
  * fingerprint normalizer, byte-loop form of
  * `regexp_replace(lower(s), '[^a-z0-9]', '')` for already-lowercased
  * input. Byte-level filtering is exact: in UTF-8, bytes of multi-byte
  * sequences are ≥ 0x80 and can never alias an ASCII `[a-z0-9]` byte, so
  * dropping per byte equals dropping per code point. Replaces a per-match
  * regex appendReplacement loop in the exact-dedup hot path (the oracle
  * keeps the regexp form — semantics are identical).
  */
case class StripNonAlnum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_non_alnum"

  override def nullSafeEval(input: Any): Any =
    StripNonAlnum.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StripNonAlnum.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripNonAlnum =
    copy(child = newChild)
}

object StripNonAlnum {
  def strip(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val out = new Array[Byte](bytes.length)
    var i = 0
    var k = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) { out(k) = b; k += 1 }
      i += 1
    }
    UTF8String.fromBytes(out, 0, k)
  }
}

/** `simhash64(text)`: 64-bit SimHash over whitespace word tokens —
  * md5-derived token hashes vote ±1 per bit (every occurrence votes, so
  * votes are term-frequency-weighted); bit `p` of the result is set when
  * votes(p) > 0, where bit `p` reads the token digest MSB-first (byte
  * p/8, shift 7−p%8 — i.e. hex char p/4, nibble bit 3−p%4). A SQL oracle
  * can therefore recompute every vote from `md5(token)` hex and rebuild
  * the `format_string("%016x", h)` rendering nibble-by-nibble — the whole
  * SimHash near-dup pipeline is oracle-checkable (an engine extension;
  * the reference dedups only by exact FAISS vectors).
  *
  * Native expression rather than a Scala UDF: no encoder
  * serialization boundary in a 100 TB corpus scan. */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.simhash(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def simhash(text: String): Long = {
    if (text == null) return 0L
    val votes = new Array[Int](64)
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
    // One digest instance per document, reset per token.
    val md = java.security.MessageDigest.getInstance("MD5")
    toks.foreach { t =>
      md.reset()
      val d = md.digest(t.getBytes("UTF-8"))
      var bit = 0
      while (bit < 64) {
        val byte = d(bit / 8)
        if (((byte >> (7 - bit % 8)) & 1) == 1) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
    }
    var h = 0L
    var bit = 0
    while (bit < 64) { if (votes(bit) > 0) h |= (1L << bit); bit += 1 }
    h
  }
}
