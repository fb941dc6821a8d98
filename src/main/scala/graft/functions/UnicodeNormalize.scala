package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition pass every
  * serious text-curation pipeline runs before hashing or dedup: the
  * same visible string can arrive as composed (é) or decomposed
  * (e + U+0301) code points, and every downstream fingerprint, shingle,
  * and equality check silently fragments unless the corpus is folded to
  * one canonical form first.
  *
  * NFC is defined by the Unicode standard, so any conformant engine
  * (java.text.Normalizer here, DuckDB's `nfc_normalize` in the oracle)
  * produces byte-identical output — which is what makes this gate
  * hash-checkable. Row-local, codegen'd; ASCII fast-path skips the
  * normalizer entirely (the overwhelmingly common case pays one scan).
  */
case class UnicodeNfc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNfc.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeNfc.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "unicode_nfc"
}

object UnicodeNfc {

  def compute(s: UTF8String): UTF8String = {
    // ASCII is NFC-invariant: skip the String round-trip entirely
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfc(c: Column): Column = toColumn(UnicodeNfc(exprOf(c)))
}
