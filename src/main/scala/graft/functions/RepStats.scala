package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `rep_stats(text)`: the Gopher-family repetition signals — top-bigram
  * multiplicity and duplicate-line mass — in ONE per-row Java pass,
  * returned as a struct of exact integer counts.
  *
  * The composed HOF forms ([[graft.operators.TextAnalysis.topBigramFraction]]
  * sort+run-length fold, [[graft.operators.TextAnalysis.dupLineStats]]
  * split→distinct→char sums) run interpreted per array element
  * (higher-order functions are CodegenFallback and Catalyst does no
  * cross-lambda subexpression elimination) — the exact shape the
  * `screen_flags` and `dsir_logw` kernels replaced at measured 2.2–8.8×.
  * Field values are defined EXACTLY as the composed forms compute them
  * (and as the q55/q60 DuckDB oracles replay them), so the ratio columns
  * are ONE division of these integers on either side:
  *   n_bigrams       = max(n_tokens − 1, 0), tokens of
  *                     `split(lower(trim(text)), '\s+')`
  *   top_bigram      = max multiplicity over adjacent-token bigrams
  *                     (0 when n_bigrams = 0)
  *   n_lines         = non-empty trimmed lines of `split(text, '\n')`
  *   n_unique_lines  = distinct such lines
  *   line_chars      = summed code-point length over ALL non-empty lines
  *   uniq_line_chars = summed code-point length over the DISTINCT set
  *
  * Trim/lower are the engine's own (`UTF8String.trim` strips 0x20 only,
  * matching SQL `trim`; `UTF8String.toLowerCase` matches SQL `lower`) —
  * NOT Java's `String.trim`, which also strips control chars and would
  * diverge from the oracle on `\t`/`\n`-edged text.
  */
case class RepStatsExpression(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = RepStatsExpression.schema
  override def prettyName: String = "rep_stats"

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]

    // ---- top-bigram multiplicity over lower(trim(text)) tokens ----
    val lowered = u.trim().toLowerCase.toString
    val toks = RepStatsExpression.ws.split(lowered, -1)
    val nBigrams = math.max(toks.length - 1, 0).toLong
    var topBigram = 0L
    if (nBigrams > 0) {
      val counts = new java.util.HashMap[String, Int](toks.length * 2)
      var i = 0
      while (i < toks.length - 1) {
        val bg = toks(i) + " " + toks(i + 1)
        val c = counts.merge(bg, 1, Integer.sum)
        if (c > topBigram) topBigram = c
        i += 1
      }
    }

    // ---- duplicate-line mass over trim-per-line of split(text, '\n') ----
    val text = u.toString
    var nLines = 0L
    var lineChars = 0L
    var uniqChars = 0L
    val seen = new java.util.HashSet[String]()
    var start = 0
    val n = text.length
    var pos = 0
    while (pos <= n) {
      if (pos == n || text.charAt(pos) == '\n') {
        // engine trim semantics: strip 0x20 only (SQL trim), not \t/\r
        var a = start
        var b = pos
        while (a < b && text.charAt(a) == ' ') a += 1
        while (b > a && text.charAt(b - 1) == ' ') b -= 1
        if (b > a) {
          val line = text.substring(a, b)
          val len = line.codePointCount(0, line.length).toLong
          nLines += 1
          lineChars += len
          if (seen.add(line)) uniqChars += len
        }
        start = pos + 1
      }
      pos += 1
    }

    InternalRow(nBigrams, topBigram, nLines, seen.size.toLong,
      lineChars, uniqChars)
  }

  override protected def withNewChildInternal(newChild: Expression): RepStatsExpression =
    copy(child = newChild)
}

object RepStatsExpression {
  val schema: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_bigram", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_unique_lines", LongType, nullable = false),
    StructField("line_chars", LongType, nullable = false),
    StructField("uniq_line_chars", LongType, nullable = false)))

  private val ws = java.util.regex.Pattern.compile("\\s+")
}
