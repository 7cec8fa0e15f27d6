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

  test("SQL generator structure: balanced, every regex pass global, 7 entities") {
    // The true cross-engine equality runs at the q128 oracle gate (no
    // DuckDB here); this pins the generator's STRUCTURE so a dropped
    // flag or paren fails fast with a pointer to the cause.
    val sql = HtmlIngest.htmlToTextSql("src")
    assert(sql.count(_ == '(') == sql.count(_ == ')'), "unbalanced parens")
    // 5 tag-stripping + 4 whitespace/trim passes, each explicitly global
    assert("'g'\\)".r.findAllIn(sql).size == 9,
      s"expected 9 'g'-flagged regexp_replace closes in: $sql")
    assert("replace\\(".r.findAllIn(sql).size
      - "regexp_replace\\(".r.findAllIn(sql).size == 7,
      "one plain replace per named entity")
    val tsql = HtmlIngest.htmlTitleSql("src")
    assert(tsql.count(_ == '(') == tsql.count(_ == ')'))
    assert(tsql.startsWith("trim(") &&
      "replace\\(".r.findAllIn(tsql).size == 7) // one per named entity
  }
}
