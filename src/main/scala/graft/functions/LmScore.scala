package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `lm_score(text, vocab_map, total)`: the unigram-LM quality fold in
  * ONE per-row Java pass — tokenize (`lower(trim(text))` split on
  * `\s+`, empties dropped), sort tokens ASCENDING by UTF8String byte
  * order (Spark's `array_sort` / DuckDB binary-collation `list_sort` —
  * NOT Java's UTF-16 `String` order, which diverges on supplementary
  * chars), then fold `Σ ln p(token)` with the OOV floor
  * `ln(1/(total+1))`, counting OOVs. Returns
  * `struct(sum double, n_tokens long, n_oov long)`.
  *
  * Replaces [[graft.operators.TextAnalysis.lmScore]]'s interpreted
  * `aggregate` lambda whose `element_at` on a map column is a linear
  * scan per token (the q81 pathology). The vocab rides as a foldable
  * map literal (model-table-sized — bounded by the vocab's `k`), probed
  * through a HashMap keyed by the map's own UTF8String keys. The
  * accumulation order and IEEE op sequence are identical to the HOF
  * fold, so the q70 oracle replay is unchanged. */
case class LmScoreExpression(first: Expression, second: Expression,
                             third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("sum", DoubleType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_oov", LongType, nullable = false)))
  override def prettyName: String = "lm_score"

  @transient private lazy val vocab: java.util.HashMap[UTF8String, java.lang.Double] =
    second match {
      case Literal(m: MapData, MapType(StringType, DoubleType, _)) if m != null =>
        val hm = new java.util.HashMap[UTF8String, java.lang.Double](
          m.numElements() * 2)
        val ks = m.keyArray()
        val vs = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          hm.put(ks.getUTF8String(i), vs.getDouble(i))
          i += 1
        }
        hm
      case other => throw new IllegalArgumentException(
        s"lm_score needs a foldable map<string,double> vocab literal, got $other")
    }

  @transient private lazy val total: Long = third match {
    case Literal(t: Long, LongType) => t
    case other => throw new IllegalArgumentException(
      s"lm_score needs a foldable bigint total literal, got $other")
  }

  override def nullSafeEval(text: Any, v: Any, t: Any): Any = {
    val lowered = text.asInstanceOf[UTF8String].trim().toLowerCase.toString
    val toks = LmScoreExpression.ws.split(lowered, -1)
      .filter(_.nonEmpty).map(UTF8String.fromString)
    java.util.Arrays.sort(toks,
      (a: UTF8String, b: UTF8String) => a.compareTo(b))
    val oovlp = math.log(1.0 / (total.toDouble + 1.0))
    var s = 0.0
    var oov = 0L
    var i = 0
    while (i < toks.length) {
      val lp = vocab.get(toks(i))
      if (lp == null) { s += oovlp; oov += 1L } else s += lp.doubleValue()
      i += 1
    }
    InternalRow(s, toks.length.toLong, oov)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): LmScoreExpression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LmScoreExpression {
  private val ws = java.util.regex.Pattern.compile("\\s+")
}
