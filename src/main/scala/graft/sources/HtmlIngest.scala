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
  *  4. entity decode: numeric references first (the pinned bounded set,
  *     one [[graft.functions.DecodeNumRefs]] kernel pass), then the
  *     named set with `&amp;` LAST — the single-decode rule, so
  *     `&amp;lt;` yields the literal `&lt;` (never `<`) and
  *     `&amp;#228;` yields the literal `&#228;` (never `ä`)
  *  5. whitespace canon: space runs, trimmed line edges, ≤1 blank line
  *
  * Callers must have run `GraftFunctions.register` on the session (every
  * graft entry point does) — the numeric decode is a registered kernel.
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
    * an entity cannot desynchronize them. */
  private val Entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'",
    "&amp;" -> "&")

  /** The pinned numeric-reference codepoint set: the Latin-1 supplement
    * (160–255 — the reference's Finnish corpus arrives with `ä` as
    * `&#228;`) plus the Windows-1252 punctuation repertoire. The ONE
    * list behind the engine kernel's membership bitmap
    * ([[graft.functions.DecodeNumRefs]]) and the oracle's enumerated
    * replace fold — extending it cannot desynchronize the two. Only
    * CANONICAL references decode (no leading zeros, `;`-terminated);
    * anything else, including out-of-set ASCII codepoints like `&#38;`
    * or `&#60;`, stays literal for the numeric pass — `&#39;` then
    * decodes via the NAMED table (its long-standing entry), preserving
    * historical outputs, while `&#38;` stays literal by the
    * single-decode rule exactly like `&amp;amp;`. */
  private[graft] val NumericCps: Seq[Int] =
    (160 to 255) ++ Seq(338, 339, 352, 353, 376, 402, 710, 732,
      8211, 8212, 8216, 8217, 8218, 8220, 8221, 8222, 8224, 8225,
      8226, 8230, 8240, 8249, 8250, 8364, 8482)

  private def decodeEntities(c: Column): Column =
    Entities.foldLeft(graft.functions.GraftFunctions.decodeNumRefs(c)) {
      case (acc, (from, to)) =>
        regexp_replace(acc, java.util.regex.Pattern.quote(from),
          java.util.regex.Matcher.quoteReplacement(to))
    }

  /** The named-entity SQL fold over `inner` (single-quote escaping
    * applied to the replacement). */
  private def namedSqlFold(inner: String): String =
    Entities.foldLeft(inner) { case (acc, (from, to)) =>
      s"replace($acc, '${from.replace("'", "''")}', '${to.replace("'", "''")}')"
    }

  /** One numeric-codepoint SQL pass: decimal as an exact literal
    * replace, hex as ONE case-insensitive pattern. Sequential
    * per-codepoint replacement ≡ the kernel's one-pass scan: patterns
    * are disjoint literals and decoded outputs can never form a new
    * reference. */
  private def numericSqlPass(acc: String, cp: Int): String =
    s"regexp_replace(replace($acc, '&#$cp;', chr($cp)), " +
      s"'(?i)&#x${cp.toHexString};', chr($cp), 'g')"

  /** The tag-stripping front of [[htmlToText]] (passes 1–3 of the doc
    * comment) as one SQL expression. */
  private def preEntitySql(src: String): String =
    s"regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace($src, " +
      "'(?is)<script[^>]*>.*?</script>', ' ', 'g'), " +
      "'(?is)<style[^>]*>.*?</style>', ' ', 'g'), " +
      "'(?s)<!--.*?-->', ' ', 'g'), " +
      "'(?i)<(br|/p|/div|/h[1-6]|/li|/tr|/ul|/ol|/table|/blockquote)[^>]*>', chr(10), 'g'), " +
      "'<[^>]*>', ' ', 'g')"

  /** The whitespace-canonicalization tail of [[htmlToText]] (pass 5). */
  private def postEntitySql(src: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace($src,
       |  '[ \\t\\x0b\\f\\r]+', ' ', 'g'), ' ?\\n ?', chr(10), 'g'),
       |  '\\n{3,}', chr(10) || chr(10), 'g'), '^[ \\n]+|[ \\n]+$$', '', 'g')""".stripMargin

  /** Codepoints per oracle CTE step: 2 SQL calls per codepoint per
    * column must stay well under DuckDB's 128-deep binder recursion
    * limit (the whole 121-cp fold as ONE nested expression exceeds it —
    * hence the CTE pipeline, which resets the depth per step). */
  private val OracleChunk = 20

  /** The oracle-side replay of [[htmlToText]] + [[htmlTitle]] over
    * relation `rel` as a CTE PIPELINE — kept adjacent to the Spark
    * chain so the two stay in lockstep (same passes, same order, DuckDB
    * `'g'` flags). Produces CTEs `__hx0 … __hxN` and the final
    * `__html($keyCol, title, txt)`. Usage:
    * `WITH src AS (...), ${htmlSqlCtes("src", "doc_id", "html")}
    *  SELECT doc_id, title, md5(txt) FROM __html`. */
  def htmlSqlCtes(rel: String, keyCol: String, htmlCol: String): String = {
    val first =
      s"""__hx0 AS (
         |  SELECT $keyCol,
         |    regexp_extract($htmlCol, '(?is)<title[^>]*>(.*?)</title>', 1) AS t,
         |    ${preEntitySql(htmlCol)} AS x
         |  FROM $rel)""".stripMargin
    val chunks = NumericCps.grouped(OracleChunk).toSeq
    val steps = chunks.zipWithIndex.map { case (cps, i) =>
      val tFold = cps.foldLeft("t")(numericSqlPass)
      val xFold = cps.foldLeft("x")(numericSqlPass)
      s"""__hx${i + 1} AS (
         |  SELECT $keyCol, $tFold AS t, $xFold AS x FROM __hx$i)""".stripMargin
    }
    val last =
      s"""__html AS (
         |  SELECT $keyCol, trim(${namedSqlFold("t")}) AS title,
         |    ${postEntitySql(namedSqlFold("x"))} AS txt
         |  FROM __hx${chunks.length})""".stripMargin
    (first +: steps :+ last).mkString(",\n")
  }
}
