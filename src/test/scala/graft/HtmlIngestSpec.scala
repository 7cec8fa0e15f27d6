package graft

import graft.sources.HtmlIngest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HtmlIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(HtmlIngest.htmlToText(col("h")).as("t"))
      .as[String].head()

  private def title(html: String): String =
    Seq(html).toDF("h").select(HtmlIngest.htmlTitle(col("h")).as("t"))
      .as[String].head()

  test("script/style/comment content is removed entirely") {
    val h = "<p>keep</p><script>var x = 1; if (x < 2) drop();</script>" +
      "<style>p{color:red}</style><!-- secret -->tail"
    assert(extract(h) == "keep\ntail")
  }

  test("block-closing tags become newlines; inline tags become spaces") {
    val h = "<h1>Head</h1><p>one two</p><ul><li>a</li><li>b</li></ul>" +
      "<span>x</span><b>y</b>"
    // </li> and </ul> each close a block: the list ends with a blank
    // line (two newlines survive the <=1-blank-line collapse)
    assert(extract(h) == "Head\none two\na\nb\n\nx y")
  }

  test("entities decode once, &amp; last") {
    assert(extract("a &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;b") ==
      "a <tag> \"q\" 's'  b".replaceAll(" +", " "))
    // double-encoded stays single-decoded: &amp;lt; is the LITERAL &lt;
    assert(extract("x &amp;lt; y") == "x &lt; y")
    assert(extract("x &amp;amp; y") == "x &amp; y")
  }

  test("whitespace canon: runs collapse, line edges trim, <=1 blank line") {
    val h = "<p>a   b\t c</p><p></p><p></p><p>  d  </p>"
    assert(extract(h) == "a b c\n\nd")
  }

  test("malformed markup degrades to text, never errors") {
    // unclosed tag start survives as literal text (no '>' to bound it)
    assert(extract("text <p unclosed") == "text <p unclosed")
    assert(extract("") == "")
    assert(extract("plain, no markup") == "plain, no markup")
  }

  test("title extraction: entity-decoded, trimmed, empty when absent") {
    assert(title("<html><head><title> A &amp; B </title></head></html>") ==
      "A & B")
    assert(title("<html><head></head><body>x</body></html>") == "")
    // case-insensitive tag match
    assert(title("<TITLE>Caps</TITLE>") == "Caps")
  }

  test("numeric references: pinned set decodes, everything else stays literal") {
    // Decimal, hex (either case), title position.
    assert(extract("<p>K&#228;ytt&#246; caf&#xE9; &#X2014; ok</p>")
      == "Käyttö café — ok")
    assert(title("<title>R&#233;sum&#233; &#8230;</title>") == "Résumé …")
    // Out-of-set (&#38; ASCII, &#999999; beyond), non-canonical
    // (leading zero), unterminated, and empty references stay literal.
    assert(extract("<p>&#38; &#999999; &#0228; &#228 &#; &#x;</p>")
      == "&#38; &#999999; &#0228; &#228 &#; &#x;")
    // Single-decode: the amp-protected reference surfaces as its
    // literal text, never double-decoded.
    assert(extract("<p>&amp;#228; vs &#228;</p>") == "&#228; vs ä")
  }

  test("SQL generator structure: balanced, global flags, bounded CTE depth") {
    // The true cross-engine equality runs at the q128 oracle gate (no
    // DuckDB here); this pins the generator's STRUCTURE so a dropped
    // flag, paren, or a binder-recursion regression fails fast.
    val nNum = HtmlIngest.NumericCps.size // 96 Latin-1 + 25 cp1252 extras
    assert(nNum == 121)
    val sql = HtmlIngest.htmlSqlCtes("src", "doc_id", "html")
    assert(sql.count(_ == '(') == sql.count(_ == ')'), "unbalanced parens")
    // 5 tag-stripping + 4 whitespace/trim passes + one hex pass per
    // numeric codepoint PER COLUMN (title + text), each explicitly global
    assert("'g'\\)".r.findAllIn(sql).size == 9 + 2 * nNum,
      s"expected ${9 + 2 * nNum} 'g'-flagged regexp_replace closes")
    // one plain replace per numeric decimal form per column + the named
    // fold on each of the two final columns
    assert("replace\\(".r.findAllIn(sql).size
      - "regexp_replace\\(".r.findAllIn(sql).size == 2 * nNum + 2 * 7,
      "decimal replaces + named-entity folds")
    // every CTE step's expression nesting stays under DuckDB's 128-deep
    // binder recursion limit (the reason this is a CTE pipeline at all):
    // deepest step = OracleChunk cps x 2 calls + slack
    sql.split("__hx\\d+ AS|__html AS").foreach { step =>
      var depth = 0; var worst = 0
      step.foreach {
        case '(' => depth += 1; worst = math.max(worst, depth)
        case ')' => depth -= 1
        case _ =>
      }
      assert(worst < 100, s"a CTE step nests $worst deep (binder limit 128)")
    }
  }
}
