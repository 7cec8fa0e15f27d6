package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `decode_num_refs(text)`: decode HTML numeric character references
  * (`&#NNN;` decimal, `&#xHH;`/`&#XHH;` hex, digits case-insensitive)
  * for a BOUNDED, pinned codepoint set — the Latin-1 supplement
  * (160–255, the reference corpus's Finnish `ä`/`ö` as `&#228;`/
  * `&#246;`) plus the Windows-1252 punctuation repertoire (en/em
  * dashes, curly quotes, ellipsis, €, ™, …) that dominates real crawls.
  *
  * ONE per-row scan (the 100 TB shape — an enumerated
  * replace-per-codepoint chain would stack ~240 string passes onto the
  * extraction chain), but pinned to semantics a DuckDB oracle replays
  * as exactly that enumerated fold over the same
  * [[graft.sources.HtmlIngest.NumericCps]] list:
  *
  *  - only CANONICAL references decode: no leading zeros (`&#0228;`
  *    stays literal), ≤ 7 digits, terminating `;` required;
  *  - a reference outside the pinned set stays literal byte-for-byte
  *    (`&#999999;`, `&#38;` — the latter also preserves the
  *    single-decode rule: `&amp;#228;` never becomes `ä` because the
  *    numeric pass runs BEFORE `&amp;` decodes);
  *  - decoded outputs are non-ASCII BMP chars that can never form a
  *    new reference, so the one-pass scan ≡ the sequential
  *    replace-per-codepoint fold (no cascade on either side).
  */
case class DecodeNumRefs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "decode_num_refs"

  override def nullSafeEval(s: Any): Any =
    DecodeNumRefs.decode(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DecodeNumRefs.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): DecodeNumRefs =
    copy(child = newChild)
}

object DecodeNumRefs {
  /** Membership bitmap over [[graft.sources.HtmlIngest.NumericCps]] —
    * the ONE list both this kernel and the SQL oracle fold derive from. */
  private lazy val allowed: java.util.BitSet = {
    val bs = new java.util.BitSet(8500)
    graft.sources.HtmlIngest.NumericCps.foreach(bs.set)
    bs
  }
  private lazy val maxCp: Int = graft.sources.HtmlIngest.NumericCps.max

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  def decode(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    if (str.indexOf("&#") < 0) return s
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      var emitted = false
      if (c == '&' && i + 2 < n && str.charAt(i + 1) == '#') {
        var j = i + 2
        val hex = j < n && (str.charAt(j) == 'x' || str.charAt(j) == 'X')
        if (hex) j += 1
        val ds = j
        var cp = 0L
        var run = true
        while (run && j < n && j - ds < 7) {
          val v = if (hex) hexVal(str.charAt(j))
                  else if (str.charAt(j) >= '0' && str.charAt(j) <= '9')
                    str.charAt(j) - '0'
                  else -1
          if (v < 0) run = false
          else { cp = cp * (if (hex) 16 else 10) + v; j += 1 }
        }
        val len = j - ds
        val canonical = len >= 1 && !(len > 1 && str.charAt(ds) == '0')
        if (canonical && j < n && str.charAt(j) == ';' &&
            cp <= maxCp && allowed.get(cp.toInt)) {
          sb.append(cp.toInt.toChar) // pinned set is single-char BMP only
          i = j + 1
          emitted = true
        }
      }
      if (!emitted) { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }
}
