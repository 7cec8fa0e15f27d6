package graft.functions

import graft.operators.TextAnalysis
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `screen_flags(text, minWords, maxWords, minLineWords, minSentences)`:
  * the Gopher AND C4 screen verdicts in ONE Java kernel pass — the
  * [[TextStatsExpression]] treatment applied to the corpus-screen rules.
  *
  * The composed `TextAnalysis.gopherFlags`/`c4Signals` forms are
  * higher-order-function chains: every lambda runs interpreted, each
  * metric re-tokenizes, and the intermediate arrays materialize per rule.
  * This kernel tokenizes once, walks lines once, and emits both structs'
  * fields with EXACTLY the composed forms' semantics (the parity spec
  * compares field-for-field against them on generated inputs — that, not
  * re-derivation, is the correctness argument; the DuckDB oracles keep
  * matching because the composed forms already do):
  *
  *  - words = runs of non-`[ \t\n\x0b\f\r]` chars in the space-trimmed
  *    text; word length in code points.
  *  - Spark's `split(line, "\\s+")` keeps leading/trailing empties
  *    (limit −1), so a kept-line's "word count" is ws-runs + 1 — NOT the
  *    filtered token count. Replicated bit-for-bit.
  *  - `regexp_count(t, "\\.\\.\\.")` is non-overlapping, left-to-right.
  *  - distinct-stopword hits track presence per stopword, not token
  *    multiplicity; lowercasing is Locale.ROOT (the TextStats rule).
  */
case class ScreenFlagsExpression(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def dataType: DataType = ScreenFlagsExpression.schema
  override def nullable: Boolean = false
  override def prettyName: String = "screen_flags"

  @transient private lazy val Seq(minWords, maxWords, minLineWords, minSentences) =
    children.tail.map {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"screen_flags needs foldable int thresholds, got $other")
    }

  override def eval(input: InternalRow): Any = {
    val raw = children.head.eval(input)
    val text = if (raw == null) "" else raw.asInstanceOf[UTF8String].toString
    ScreenFlagsExpression.compute(text, minWords, maxWords,
      minLineWords, minSentences)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ScreenFlagsExpression =
    copy(children = newChildren)
}

object ScreenFlagsExpression {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("symbol_ratio", DoubleType, nullable = false),
    StructField("bullet_frac", DoubleType, nullable = false),
    StructField("ellipsis_frac", DoubleType, nullable = false),
    StructField("alpha_frac", DoubleType, nullable = false),
    StructField("n_stop_hits", LongType, nullable = false),
    StructField("gopher_keep", BooleanType, nullable = false),
    StructField("text_c4", StringType, nullable = false),
    StructField("n_kept_lines", LongType, nullable = false),
    StructField("n_sentences", LongType, nullable = false),
    StructField("has_lorem", BooleanType, nullable = false),
    StructField("has_brace", BooleanType, nullable = false),
    StructField("c4_keep", BooleanType, nullable = false)))

  private val stopwords: Array[String] = TextAnalysis.GopherStopwords.toArray

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  private[graft] def compute(text: String, minWords: Int, maxWords: Int,
                             minLineWords: Int, minSentences: Int): InternalRow = {
    // ---- word pass (gopher) over the space-trimmed text ----
    val t = trimSpaces(text)
    var nWords = 0L
    var sumLen = 0L
    var nAlpha = 0L
    val stopSeen = new Array[Boolean](stopwords.length)
    var i = 0
    val n = t.length
    while (i < n) {
      while (i < n && isWs(t.charAt(i))) i += 1
      if (i < n) {
        val start = i
        var hasAlpha = false
        while (i < n && !isWs(t.charAt(i))) {
          val c = t.charAt(i)
          if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) hasAlpha = true
          i += 1
        }
        nWords += 1
        sumLen += t.codePointCount(start, i)
        if (hasAlpha) nAlpha += 1
        val lower = t.substring(start, i).toLowerCase(java.util.Locale.ROOT)
        var s = 0
        while (s < stopwords.length) {
          if (!stopSeen(s) && lower == stopwords(s)) stopSeen(s) = true
          s += 1
        }
      }
    }
    var nStop = 0L
    var s = 0
    while (s < stopwords.length) { if (stopSeen(s)) nStop += 1; s += 1 }

    // ---- symbol pass: '#' chars + non-overlapping "..." ----
    var nSymbols = 0L
    i = 0
    while (i < n) {
      val c = t.charAt(i)
      if (c == '#') { nSymbols += 1; i += 1 }
      else if (c == '.' && i + 2 < n && t.charAt(i + 1) == '.' &&
        t.charAt(i + 2) == '.') { nSymbols += 1; i += 3 }
      else i += 1
    }

    // ---- line pass (gopher line rules + C4 kept lines) ----
    var nLines = 0L
    var nBullet = 0L
    var nEllipsis = 0L
    var nKept = 0L
    var nSent = 0L
    val cleaned = new java.lang.StringBuilder
    var lineStart = 0
    var pos = 0
    while (pos <= n) {
      if (pos == n || t.charAt(pos) == '\n') {
        val line = trimSpaces(t.substring(lineStart, pos))
        if (line.nonEmpty) {
          nLines += 1
          val first = line.charAt(0)
          if (first == '-' || first == '*' || first == '•') nBullet += 1
          if (line.length >= 3 && line.endsWith("...")) nEllipsis += 1
          // C4 kept-line rule: ends [.!?] optionally + '"';
          // Spark split(l, "\\s+") size = ws-runs + 1; no 'javascript'
          val last = line.charAt(line.length - 1)
          val endsPunct = last == '.' || last == '!' || last == '?' ||
            (last == '"' && line.length >= 2 && {
              val p = line.charAt(line.length - 2)
              p == '.' || p == '!' || p == '?'
            })
          if (endsPunct) {
            var runs = 0
            var j = 0
            var inRun = false
            while (j < line.length) {
              val ws = isWs(line.charAt(j))
              if (ws && !inRun) { runs += 1; inRun = true }
              else if (!ws) inRun = false
              j += 1
            }
            val lineWords = runs + 1
            if (lineWords >= minLineWords &&
              !line.toLowerCase(java.util.Locale.ROOT).contains("javascript")) {
              if (nKept > 0) cleaned.append('\n')
              cleaned.append(line)
              nKept += 1
              var k = 0
              while (k < line.length) {
                val c = line.charAt(k)
                if (c == '.' || c == '!' || c == '?') nSent += 1
                k += 1
              }
            }
          }
        }
        lineStart = pos + 1
      }
      pos += 1
    }

    // ---- page flags ----
    val lowerAll = t.toLowerCase(java.util.Locale.ROOT)
    val hasLorem = lowerAll.contains("lorem ipsum")
    val hasBrace = t.indexOf('{') >= 0

    val meanLen = if (nWords == 0) 0.0 else sumLen.toDouble / nWords
    val symbolRatio = if (nWords == 0) 0.0 else nSymbols.toDouble / nWords
    val bulletFrac = if (nLines == 0) 0.0 else nBullet.toDouble / nLines
    val ellipsisFrac = if (nLines == 0) 0.0 else nEllipsis.toDouble / nLines
    val alphaFrac = if (nWords == 0) 0.0 else nAlpha.toDouble / nWords
    val gopherKeep = nWords >= minWords && nWords <= maxWords &&
      meanLen >= 3.0 && meanLen <= 10.0 && symbolRatio <= 0.1 &&
      bulletFrac < 0.9 && ellipsisFrac < 0.3 && alphaFrac >= 0.8 &&
      nStop >= 2
    val c4Keep = !hasLorem && !hasBrace && nSent >= minSentences

    InternalRow(nWords, meanLen, symbolRatio, bulletFrac, ellipsisFrac,
      alphaFrac, nStop, gopherKeep, UTF8String.fromString(cleaned.toString),
      nKept, nSent, hasLorem, hasBrace, c4Keep)
  }
}
