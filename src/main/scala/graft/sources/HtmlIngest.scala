package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for web-corpus ingest — the
  * boilerplate-stripping front (trafilatura/jusText class, reduced to
  * the deterministic core) every crawled training corpus passes
  * through before the quality/dedup tiers. Beside [[DocxIngest]] in the
  * ingest family: where DOCX walks a zip+XML container, HTML reduces to
  * a pinned chain of REGEX passes over one string column.
  *
  * Built entirely from codegen'd built-ins (`regexp_replace` /
  * `replace` / `trim`) in the Java∩RE2 subset (inline `(?is)` flags,
  * lazy quantifiers — both dialects agree), so the DuckDB oracle replays
  * the chain verbatim (with its `'g'` flag — DuckDB replaces first
  * match only by default, the q54 gotcha). No HTML parser dependency
  * exists in this environment, and none is needed for the pipeline
  * role: malformed markup degrades to text-with-noise, never to an
  * error (P10 posture).
  *
  * Pass order is LOAD-BEARING and shared with the oracle:
  *  1. drop `<script>`/`<style>` blocks and comments (content too)
  *  2. block-closing tags → newline (paragraph structure survives)
  *  3. every remaining tag → space
  *  4. entity decode, `&amp;` LAST — the single-decode rule, so
  *     `&amp;lt;` yields the literal `&lt;` (never `<`)
  *  5. whitespace canon: space runs, trimmed line edges, ≤1 blank line
  */
object HtmlIngest {

  /** Extracted text of an HTML column. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val breaks = regexp_replace(noComment,
      "(?i)<(br|/p|/div|/h[1-6]|/li|/tr|/ul|/ol|/table|/blockquote)[^>]*>", "\n")
    val noTags = regexp_replace(breaks, "<[^>]*>", " ")
    val decoded = decodeEntities(noTags)
    val spaces = regexp_replace(decoded, "[ \\t\\x0b\\f\\r]+", " ")
    val edges = regexp_replace(spaces, " ?\\n ?", "\n")
    // regex trim: the edge characters include newlines, which the
    // default space-only trim would leave behind (and the two-param
    // trim logs a deprecation WARN per query in Spark 4)
    regexp_replace(regexp_replace(edges, "\\n{3,}", "\n\n"),
      "^[ \\n]+|[ \\n]+$", "")
  }

  /** `<title>` content (entity-decoded, trimmed); empty when absent. */
  def htmlTitle(html: Column): Column =
    trim(decodeEntities(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)))

  /** The named-entity set, decoded once, `&amp;` LAST — the ONE table
    * behind both the Spark chain and the two SQL generators, so adding
    * an entity cannot desynchronize them. Numeric references are
    * deliberately left as-is: decoding them is locale/parser territory,
    * and leaving them visible keeps the operator a pure pinned-regex
    * chain the oracle can replay. */
  private val Entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'",
    "&amp;" -> "&")

  private def decodeEntities(c: Column): Column =
    Entities.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from),
        java.util.regex.Matcher.quoteReplacement(to))
    }

  /** The SQL-side entity fold over `inner` (single-quote escaping
    * applied to the replacement). */
  private def entitySqlFold(inner: String): String =
    Entities.foldLeft(inner) { case (acc, (from, to)) =>
      s"replace($acc, '${from.replace("'", "''")}', '${to.replace("'", "''")}')"
    }

  /** The oracle-side replay of [[htmlToText]] for a SQL expression
    * `src` — kept adjacent to the Spark chain so the two stay in
    * lockstep (same passes, same order, DuckDB `'g'` flags). */
  def htmlToTextSql(src: String): String = {
    val ent = entitySqlFold(
      s"regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace($src, " +
        "'(?is)<script[^>]*>.*?</script>', ' ', 'g'), " +
        "'(?is)<style[^>]*>.*?</style>', ' ', 'g'), " +
        "'(?s)<!--.*?-->', ' ', 'g'), " +
        "'(?i)<(br|/p|/div|/h[1-6]|/li|/tr|/ul|/ol|/table|/blockquote)[^>]*>', chr(10), 'g'), " +
        "'<[^>]*>', ' ', 'g')")
    s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace($ent,
       |  '[ \\t\\x0b\\f\\r]+', ' ', 'g'), ' ?\\n ?', chr(10), 'g'),
       |  '\\n{3,}', chr(10) || chr(10), 'g'), '^[ \\n]+|[ \\n]+$$', '', 'g')""".stripMargin
  }

  /** Oracle-side replay of [[htmlTitle]]. */
  def htmlTitleSql(src: String): String =
    s"trim(${entitySqlFold(
      s"regexp_extract($src, '(?is)<title[^>]*>(.*?)</title>', 1)")})"
}
