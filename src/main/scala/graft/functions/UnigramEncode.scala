package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `unigram_encode(word, piece_list, logp_list)`: Viterbi-segment ONE
  * pre-token under a trained unigram language model (the
  * SentencePiece-family tokenizer of Kudo 2018, "Subword
  * Regularization" §3 — the encode half of
  * [[graft.operators.TextAnalysis.trainUnigram]]), returning the
  * maximum-likelihood piece sequence as `array<string>`.
  *
  * Pinned DP rule (the invariant the DuckDB oracle replays as a
  * recursive CTE and UnigramSpec pins against the trainer's own
  * segmenter):
  *  - symbols are CODEPOINTS (surrogate-pair safe, matching DuckDB's
  *    character-based `substr`);
  *  - `dp(0) = 0; dp(i) = max over j ∈ [max(0, i−maxLen), i) of
  *    dp(j) + lp(word[j..i))` — each candidate is ONE double addition
  *    (no accumulation-order sensitivity), maxLen = longest piece;
  *  - `lp` = the piece's trained log-prob; a SINGLE codepoint absent
  *    from the vocabulary scores the model's UNK floor (rides as the
  *    piece-list convention below); a multi-codepoint absence is −∞;
  *  - ties break toward the SMALLEST j (strict `>` replacement scanning
  *    j ascending ≡ the oracle's first-position-of-max), i.e. the
  *    longest final piece;
  *  - reconstruction walks the backpointers from i = n.
  *
  * The vocabulary rides as two LITERAL children ([[BpeEncodeExpression]]
  * posture): `piece_list[0]` must be the empty string carrying the UNK
  * log-prob in `logp_list[0]`; real pieces follow. Parsed once per
  * expression instance into a hash map + primitive arrays.
  *
  * Scale shape: like `bpe_encode`, this runs on the DISTINCT-WORD
  * table (the trainer posture), so at 100 TB the kernel cost is
  * bounded by vocabulary size, not corpus size; the per-word DP is
  * O(len·maxLen) with O(1) map probes. */
case class UnigramEncodeExpression(first: Expression, second: Expression,
                                   third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  @transient private lazy val (vocab, unkLogp, maxLen):
      (java.util.HashMap[String, java.lang.Double], Double, Int) = {
    val ps = second match {
      case Literal(v: ArrayData, ArrayType(StringType, _)) if v != null =>
        v.toObjectArray(StringType).map(_.asInstanceOf[UTF8String].toString)
      case other => throw new IllegalArgumentException(
        s"unigram_encode piece list must be an array<string> literal, got $other")
    }
    val lps = third match {
      case Literal(v: ArrayData, ArrayType(DoubleType, _)) if v != null =>
        v.toDoubleArray()
      case other => throw new IllegalArgumentException(
        s"unigram_encode logp list must be an array<double> literal, got $other")
    }
    require(ps.length == lps.length && ps.nonEmpty && ps(0).isEmpty,
      "unigram_encode expects piece_list[0] = \"\" carrying the UNK log-prob")
    val m = new java.util.HashMap[String, java.lang.Double](ps.length * 2)
    var ml = 1
    var i = 1
    while (i < ps.length) {
      m.put(ps(i), lps(i))
      val n = ps(i).codePointCount(0, ps(i).length)
      if (n > ml) ml = n
      i += 1
    }
    (m, lps(0), ml)
  }

  /** Per-task LRU memo — the [[BpeEncodeExpression]] rationale verbatim
    * (Zipfian word repetition; fixed vocab per instance). */
  @transient private lazy val memo =
    new java.util.LinkedHashMap[String, ArrayData](1024, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, ArrayData]): Boolean =
        size() > BpeEncodeExpression.MemoCap
    }

  def encodeWord(w: UTF8String): ArrayData = {
    val word = w.toString
    val hit = memo.get(word)
    if (hit != null) return hit
    val syms = UnigramEncodeExpression.codepoints(word)
    val out = new GenericArrayData(
      UnigramEncodeExpression.viterbi(syms, vocab, unkLogp, maxLen)
        .map(s => UTF8String.fromString(s)).asInstanceOf[Array[Any]])
    memo.put(word, out)
    out
  }

  override def nullSafeEval(w: Any, l: Any, r: Any): Any =
    encodeWord(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("uniEnc", this,
      classOf[UnigramEncodeExpression].getName)
    defineCodeGen(ctx, ev, (w, _, _) => s"$ref.encodeWord($w)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): UnigramEncodeExpression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object UnigramEncodeExpression {

  private[graft] def codepoints(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** The pinned Viterbi DP — shared verbatim by the kernel and the
    * trainer's E-step ([[graft.operators.TextAnalysis.trainUnigram]]),
    * so training and encoding segment identically by construction (the
    * `applyMergePass` stance). */
  private[graft] def viterbi(syms: Array[String],
                             vocab: java.util.HashMap[String, java.lang.Double],
                             unkLogp: Double, maxLen: Int): Array[String] = {
    val n = syms.length
    if (n == 0) return Array.empty
    val dp = Array.fill(n + 1)(Double.NegativeInfinity)
    val bp = new Array[Int](n + 1)
    dp(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val piece = syms.slice(j, i).mkString
        val lpRef = vocab.get(piece)
        val lp =
          if (lpRef != null) lpRef.doubleValue()
          else if (i - j == 1) unkLogp
          else Double.NegativeInfinity
        val cand = dp(j) + lp
        if (cand > dp(i)) { dp(i) = cand; bp(i) = j }
        j += 1
      }
      i += 1
    }
    var k = n
    val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
    while (k > 0) {
      pieces += syms.slice(bp(k), k).mkString
      k = bp(k)
    }
    pieces.reverseIterator.toArray
  }
}
