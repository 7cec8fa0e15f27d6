package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_encode(word, lhs_list, rhs_list)`: apply a trained BPE merge
  * list (reference tokenizer behavior: Sennrich et al. 2016 §3.2;
  * the encode half of [[graft.operators.TextAnalysis.trainBpe]]) to ONE
  * pre-token in a single per-row Java pass, returning the final symbol
  * sequence as `array<string>`.
  *
  * Semantics are pinned to the trainer's own merge application
  * ([[graft.operators.TextAnalysis.applyMergePass]]): the word is split
  * into codepoints plus the `</w>` end-of-word marker, then each merge
  * `(lhs, rhs)` is applied IN RANK ORDER as one left-to-right
  * non-overlapping replacement pass. Training and encoding therefore
  * share one definition of "apply a merge" — the invariant every BPE
  * implementation needs and the property the spec pins.
  *
  * The merge list rides as two `array<string>` LITERAL children (rank
  * order), parsed once per expression instance — the [[HammingWords]]
  * baked-literal posture, so the per-row loop touches only primitive
  * arrays. The DuckDB oracle replays the same pass as a nested
  * `list_reduce` fold per merge: a fold that merges `acc.last == lhs`
  * with the incoming `rhs` is equivalent to the non-overlapping pass
  * because a just-merged symbol `lhs+rhs` can never equal `lhs` (rhs is
  * nonempty), so cascades within one pass are impossible on both sides.
  *
  * Scale shape: this runs on the DISTINCT-WORD table (the trainer
  * posture — merges operate on word frequencies, never the token
  * stream), so at 100 TB the kernel cost is bounded by vocabulary size,
  * not corpus size.
  */
case class BpeEncodeExpression(first: Expression, second: Expression,
                               third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val merges: Array[(String, String)] = {
    def strings(e: Expression): Array[String] = e match {
      case Literal(v: ArrayData, ArrayType(StringType, _)) if v != null =>
        v.toObjectArray(StringType).map(_.asInstanceOf[UTF8String].toString)
      case other =>
        throw new IllegalArgumentException(
          s"bpe_encode merge lists must be array<string> literals, got $other")
    }
    val ls = strings(second)
    val rs = strings(third)
    require(ls.length == rs.length,
      s"bpe_encode lhs/rhs lists differ: ${ls.length} vs ${rs.length}")
    ls.zip(rs)
  }

  /** Per-task memo: natural-language corpora repeat words heavily (a
    * document's fold calls this once per token occurrence), and the
    * merge list is fixed for the expression's lifetime, so encoded
    * results are safely shared. Access-order LRU, capped — vocabulary
    * is Zipfian, the hot head is what matters. Results (immutable
    * GenericArrayData) are reused across rows by design. */
  @transient private lazy val memo =
    new java.util.LinkedHashMap[String, ArrayData](1024, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, ArrayData]): Boolean =
        size() > BpeEncodeExpression.MemoCap
    }

  /** The kernel body shared by the interpreted and generated paths —
    * memo probe, codepoint split, rank-ordered merge passes. Public so
    * the generated code can call it through the plan's reference array
    * (each task deserializes its own expression instance, so the memo
    * stays per-task exactly as in the interpreted form). */
  def encodeWord(w: UTF8String): ArrayData = {
    val word = w.toString
    val hit = memo.get(word)
    if (hit != null) return hit
    var syms = BpeEncodeExpression.codepointSyms(word)
    var i = 0
    while (i < merges.length) {
      val (lh, rh) = merges(i)
      syms = graft.operators.TextAnalysis.applyMergePass(syms, lh, rh)
      i += 1
    }
    val out = new GenericArrayData(
      syms.map(s => UTF8String.fromString(s)).asInstanceOf[Array[Any]])
    memo.put(word, out)
    out
  }

  override def nullSafeEval(w: Any, l: Any, r: Any): Any =
    encodeWord(w.asInstanceOf[UTF8String])

  /** Codegen: one call into [[encodeWord]] via a baked reference to
    * this instance — the containing stage stays inside whole-stage
    * codegen (a CodegenFallback here forced every consuming projection
    * down the interpreted row path; the merge loop itself is already
    * straight-line Java either way). The merge-list literals cost
    * nothing at runtime — they are parsed once into [[merges]]. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEnc", this,
      classOf[BpeEncodeExpression].getName)
    defineCodeGen(ctx, ev, (w, _, _) => s"$ref.encodeWord($w)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BpeEncodeExpression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeEncodeExpression {
  /** Memo bound per task — ~64k distinct words ≫ any hot vocabulary
    * head; entries are small (the symbol arrays of one word). */
  private[functions] val MemoCap = 65536

  /** Codepoint split + `</w>` — the symbol alphabet shared with
    * [[graft.operators.TextAnalysis.bpePairCounts]]'s
    * `regexp_extract_all(token, '.')` rule (surrogate-pair safe). */
  private[graft] def codepointSyms(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out += "</w>"
    out.result()
  }
}
