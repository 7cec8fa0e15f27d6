package graft.functions

import graft.operators.TextAnalysis
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `text_stats(text)`: every per-document text metric in ONE tokenization
  * pass, returned as a struct.
  *
  * The composed `functions._` forms (split + filter/aggregate lambdas)
  * re-tokenize per metric and run interpreted per element (higher-order
  * functions are CodegenFallback and Catalyst does no cross-lambda
  * subexpression elimination) — ~10× slower over a documents scan. Field
  * values are defined EXACTLY as their SQL equivalents so oracle queries
  * keep matching:
  *   n_tokens      = len(regexp_split_to_array(trim(text),'\s+'))
  *   sum_word_len  = sum of token lengths (of the trimmed split)
  *   n_stop        = tokens (lowercased) ∈ TextAnalysis.Stopwords
  *   n_punct       = chars in POSIX [[:punct:]]
  *   n_chars       = length(text)
  *   n_de/en/es/fr = lowercased tokens ∈ TextAnalysis.LangMarkers(lang)
  */
case class TextStatsExpression(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TextStatsExpression.schema
  override def prettyName: String = "text_stats"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val trimmed = text.trim
    val toks = trimmed.split("\\s+")
    val nTokens = toks.length.toLong
    var sumWordLen = 0L
    var nStop = 0L
    var nDe = 0L; var nEn = 0L; var nEs = 0L; var nFr = 0L
    var i = 0
    while (i < toks.length) {
      val tok = toks(i)
      // code points, matching SQL length()/len() (UTF-16 units over-count
      // astral chars)
      sumWordLen += tok.codePointCount(0, tok.length)
      val lower = tok.toLowerCase(java.util.Locale.ROOT)
      if (TextStatsExpression.stopSet.contains(lower)) nStop += 1
      if (TextStatsExpression.deSet.contains(lower)) nDe += 1
      if (TextStatsExpression.enSet.contains(lower)) nEn += 1
      if (TextStatsExpression.esSet.contains(lower)) nEs += 1
      if (TextStatsExpression.frSet.contains(lower)) nFr += 1
      i += 1
    }
    var nPunct = 0L
    var c = 0
    while (c < text.length) {
      val ch = text.charAt(c)
      // POSIX [[:punct:]] == ASCII 33-47, 58-64, 91-96, 123-126
      if ((ch >= '!' && ch <= '/') || (ch >= ':' && ch <= '@') ||
          (ch >= '[' && ch <= '`') || (ch >= '{' && ch <= '~')) nPunct += 1
      c += 1
    }
    InternalRow(nTokens, sumWordLen, nStop, nPunct,
      text.codePointCount(0, text.length).toLong,
      nDe, nEn, nEs, nFr)
  }

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpression =
    copy(child = newChild)
}

object TextStatsExpression {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sum_word_len", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_de", LongType, nullable = false),
    StructField("n_en", LongType, nullable = false),
    StructField("n_es", LongType, nullable = false),
    StructField("n_fr", LongType, nullable = false)))

  private val stopSet = TextAnalysis.Stopwords.toSet
  private val deSet = TextAnalysis.LangMarkers("de").toSet
  private val enSet = TextAnalysis.LangMarkers("en").toSet
  private val esSet = TextAnalysis.LangMarkers("es").toSet
  private val frSet = TextAnalysis.LangMarkers("fr").toSet
}
