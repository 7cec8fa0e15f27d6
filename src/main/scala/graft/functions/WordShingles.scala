package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text, n)`: distinct word n-grams of the lowercased,
  * whitespace-tokenized text.
  *
  * Semantically identical to the SQL form
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ', toks[i],…)))`
  * over `split(lower(trim(text)), '\\s+')` — but tokenizes ONCE per row.
  * The lambda form re-evaluates the `split` for every element of every
  * shingle (Catalyst does no subexpression elimination inside higher-order
  * functions), which is quadratic in document length and dominated the
  * near-dup pipeline.
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(text: Any, nAny: Any): Any = {
    val n = nAny.asInstanceOf[Int]
    val toks = text.asInstanceOf[UTF8String].toString
      .trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)
}
