package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc(text)`: Unicode NFC normalization (canonical decomposition +
  * canonical composition) — the one normalization step Spark has no
  * built-in for. Deliberately MINIMAL: the rest of the engine's text
  * normalization ([[graft.operators.TextAnalysis.normalizeText]]) is
  * composed from codegen'd built-ins (`regexp_replace`/`trim`), so the
  * custom surface is exactly the missing primitive and nothing else.
  * Replayed in the oracle by DuckDB's `nfc_normalize` (utf8proc);
  * both implement Unicode canonical composition, parity spec-pinned on
  * composed/decomposed fixtures. */
case class NfcNormalizeExpression(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // Fast path: NFC-quick-check avoids allocating for the common
    // already-normalized (e.g. pure-ASCII) row.
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      input
    else
      UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpression =
    copy(child = newChild)
}
