package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-scanning whitespace tokenizer — bit-identical to
  * `split(trim(c), "\\s+")` but without the regex machinery, which
  * dominates the shingle/token hot path (measured 2× on the sf0.1
  * document corpus: the Java regex split costs more than the explode +
  * df-cap + join around it).
  *
  * Replicated semantics, exactly:
  *  - `trim` strips leading/trailing 0x20 spaces ONLY (other whitespace
  *    survives at the ends),
  *  - Java `\s` = the six ASCII chars `[ \t\n\x0B\f\r]`,
  *  - Spark's `split` runs with limit -1, so a leading OR trailing
  *    whitespace char surviving the trim yields an empty token at that
  *    end (unlike Java's default split, which drops trailing empties),
  *  - the empty / all-space string yields a single empty token.
  * Byte-level scanning is UTF-8-safe: multibyte sequences never contain
  * ASCII bytes.
  */
case class WhitespaceTokens(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WhitespaceTokens.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WhitespaceTokens.tokens($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "whitespace_tokens"
}

object WhitespaceTokens {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def tokens(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    var start = 0
    var end = bytes.length
    while (start < end && bytes(start) == ' ') start += 1
    while (end > start && bytes(end - 1) == ' ') end -= 1
    if (start == end) // empty after trim → Java split yields [""]
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    if (isWs(bytes(start))) out += UTF8String.EMPTY_UTF8 // leading empty token
    var i = start
    while (i < end) {
      while (i < end && isWs(bytes(i))) i += 1
      if (i < end) {
        val tokStart = i
        while (i < end && !isWs(bytes(i))) i += 1
        out += UTF8String.fromBytes(bytes, tokStart, i - tokStart)
      }
    }
    if (isWs(bytes(end - 1))) out += UTF8String.EMPTY_UTF8 // trailing empty (limit -1)
    new GenericArrayData(out.toArray)
  }

  /** Drop-in for `split(trim(c), "\\s+")`. */
  def wsTokens(c: Column): Column = toColumn(WhitespaceTokens(exprOf(c)))
}
