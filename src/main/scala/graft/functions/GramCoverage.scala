package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word-n-gram repetition coverage in one codegen'd hash pass:
  * for the n-grams of a words array (joined with single spaces),
  * returns struct(top, dup) in exact integer character units —
  *  - `top`  = max over grams of count × gram character length,
  *  - `dup`  = Σ over grams occurring ≥ 2 times of count × length.
  *
  * Bit-identical to the previous sort_array + `aggregate` run-fold
  * formulation (the math is order-independent integer arithmetic), but
  * one hash pass instead of a per-row sort plus an interpreted
  * higher-order-function fold — HOF lambdas don't participate in
  * whole-stage codegen, and the sort dominated the Gopher repetition
  * gate. Fewer than `n` words ⇒ (0, 0), matching `grams()`'s
  * no-partial-gram contract.
  */
case class GramCoverage(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = GramCoverage.outType

  override protected def nullSafeEval(input: Any): Any =
    GramCoverage.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramCoverage.compute($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "gram_coverage"
}

object GramCoverage {

  val outType: StructType = StructType(Seq(
    StructField("top", LongType, nullable = false),
    StructField("dup", LongType, nullable = false)))

  def compute(words: ArrayData, n: Int): InternalRow = {
    val sz = words.numElements()
    if (sz < n) return InternalRow(0L, 0L)
    val counts = new java.util.HashMap[UTF8String, long1]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= sz - n) {
      var j = 0
      while (j < n) { parts(j) = words.getUTF8String(i + j); j += 1 }
      val gram = UTF8String.concatWs(UTF8String.fromString(" "), parts: _*)
      val c = counts.get(gram)
      if (c == null) counts.put(gram, new long1(1L)) else c.v += 1L
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val covered = e.getValue.v * e.getKey.numChars().toLong
      if (covered > top) top = covered
      if (e.getValue.v >= 2L) dup += covered
    }
    InternalRow(top, dup)
  }

  /** mutable long box (avoids per-increment HashMap re-put). */
  final class long1(var v: Long)

  def gramCoverage(words: Column, n: Int): Column =
    toColumn(GramCoverage(exprOf(words), n))
}
