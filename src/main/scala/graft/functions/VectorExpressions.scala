package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types._

/** Codegen'd vector arithmetic for embedding columns.
  *
  * `array_dot(a, b)` is a native Catalyst expression with `doGenCode` —
  * a tight primitive loop inside whole-stage codegen, reading float or
  * double arrays directly (no `transform(cast)` materialization, no
  * boxed lambdas). The fold is left-to-right with a double accumulator,
  * bit-identical to the previous `aggregate(zip_with(...))` formulation
  * and to DuckDB's `list_sum(list_transform(...))` — so oracle
  * hash-compares are unaffected.
  *
  * This is the (b) tier of the custom-operator preference order
  * (compose built-ins < custom Expression < custom physical operator):
  * the built-ins express the semantics but evaluate lambdas per element;
  * the expression compiles to a scalar loop.
  */
object VectorExpressions {

  case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType

    private def elemType(e: Expression): DataType =
      e.dataType.asInstanceOf[ArrayType].elementType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(e: Expression) = e.dataType match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      if (ok(left) && ok(right))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"array_dot expects array<float|double>, got ${left.dataType} / ${right.dataType}")
    }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      val aFloat = elemType(left) == FloatType
      val bFloat = elemType(right) == FloatType
      var s = 0.0
      var i = 0
      while (i < n) {
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        s += x * y
        i += 1
      }
      java.lang.Double.valueOf(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
      val bGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
      // fresh names: two array_dot calls in one codegen function (e.g.
      // l2Norm(a) alongside arrayDot(a, b)) must not redeclare locals —
      // a collision aborts whole-stage codegen for the entire plan
      val n = ctx.freshName("adN")
      val s = ctx.freshName("adS")
      val i = ctx.freshName("adI")
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += (double) $a.$aGet($i) * (double) $b.$bGet($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
    override def prettyName: String = "array_dot"
  }

  def arrayDot(a: Column, b: Column): Column = toColumn(ArrayDot(exprOf(a), exprOf(b)))

  /** L2 norm via the same codegen'd loop. */
  def l2Norm(a: Column): Column = sqrt(arrayDot(a, a))
}
