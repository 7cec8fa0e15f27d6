package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `token_tf(text)`: per-document term frequencies of the GPT-2-style
  * pre-tokenizer ([[graft.operators.TextAnalysis.BpeTokenPattern]]) in
  * ONE per-row Java pass, returned as `array<struct<token, tf>>`.
  *
  * This exists for plan shape, not per-row speed: a document's tokens
  * never span rows, so corpus token statistics need only ONE exchange —
  * `explode(token_tf(text))` → `groupBy(token)` — where the composed
  * form (explode raw tokens → groupBy(doc, token) → groupBy(token))
  * shuffles every (doc, token) pair first. At 100 TB that first
  * exchange carries the per-document vocabularies for no reason: the
  * kernel collapses them in place, map-side, before anything is
  * shuffled. Entry order is UTF8String binary order (the engine-wide
  * kernel sort rule — never Java String order), so output is
  * deterministic for tests; consumers aggregate, so order carries no
  * semantics.
  *
  * Tokenization parity: `lower` is `UTF8String.toLowerCase` — the SQL
  * `lower` — and the pattern is the exact Java∩RE2 regex the q106/q111
  * oracles run, so counts are identical to the composed form by
  * construction (spec-pinned). */
case class TokenTfExpression(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TokenTfExpression.schema
  override def prettyName: String = "token_tf"

  override def nullSafeEval(input: Any): Any = {
    val lowered = input.asInstanceOf[UTF8String].toLowerCase.toString
    val counts = new java.util.HashMap[String, Long]()
    val m = TokenTfExpression.pat.matcher(lowered)
    while (m.find()) {
      counts.merge(m.group(), 1L, java.lang.Long.sum)
    }
    val entries = new Array[(UTF8String, Long)](counts.size)
    val it = counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (UTF8String.fromString(e.getKey), e.getValue)
      i += 1
    }
    java.util.Arrays.sort(entries,
      (a: (UTF8String, Long), b: (UTF8String, Long)) => a._1.compareTo(b._1))
    new GenericArrayData(entries.map { case (t, c) =>
      InternalRow(t, c)
    }.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): TokenTfExpression =
    copy(child = newChild)
}

object TokenTfExpression {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  private val pat = java.util.regex.Pattern.compile(
    graft.operators.TextAnalysis.BpeTokenPattern)
}
