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

  /** Signed fast Walsh–Hadamard transform — the O(d log d) execution of
    * the OPQ structured rotation y = (1/√d)·H·D·x
    * (`SimilaritySearch.opqRotate` documents the semantics; this is the
    * codegen'd upgrade path that scaladoc promises for 100 TB).
    *
    * The butterfly network computes the SAME y_j = Σ_i
    * (-1)^popcount(i AND j)·s_i·x_i, just associated differently —
    * mathematically identical, floating-point results differ from the
    * naive O(d²) fold only in final ulps. Both the interpreted eval and
    * the generated code call ONE static kernel ([[FwhtRotate.kernel]]),
    * so the two execution paths are bit-identical to each other by
    * construction, and the oracle replays the identical stage/op order
    * in SQL (`SketchOracleSql.opqFwhtCtes`).
    *
    * Cost per row: d·log2(d) adds vs d² multiply-adds — at d=1024 that
    * is ~100× fewer flops, and the loop runs inside whole-stage codegen
    * instead of a `CodegenFallback` higher-order-function tree.
    */
  case class FwhtRotate(child: Expression, signs: Seq[Double])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType | DoubleType, _)
          if signs.nonEmpty && (signs.length & (signs.length - 1)) == 0 =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case ArrayType(FloatType | DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"fwht_rotate: dim ${signs.length} is not a power of two")
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"fwht_rotate expects array<float|double>, got $other")
      }

    @transient private lazy val signArr: Array[Double] = signs.toArray
    private def isFloat: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[ArrayData]
      val k = FwhtKernel.instance
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        k.kernel(k.toDoubles(a, isFloat), signArr))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val signsRef = ctx.addReferenceObj("fwhtSigns", signArr, "double[]")
      val kernelRef = ctx.addReferenceObj("fwhtKernel", FwhtKernel.instance,
        "graft.functions.FwhtKernel")
      nullSafeCodeGen(ctx, ev, a => {
        s"""
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  $kernelRef.kernel($kernelRef.toDoubles($a, $isFloat), $signsRef));
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "fwht_rotate"
  }

  def fwhtRotate(a: Column, signs: Seq[Double]): Column =
    toColumn(FwhtRotate(exprOf(a), signs))

  /** A SEQUENCE of exact Householder reflections applied in one pass —
    * the learned-PCA rotation's execution tier. Composing reflections
    * as nested `zip_with(transform(...))` HOFs re-evaluates the inner
    * reflection once per outer reference (≈9 base-array evaluations per
    * row for two levels, re-paid in EVERY job of the IVF-PQ chain —
    * measured 11× on q_ann_pca2); this expression walks the chain once
    * per row through one static kernel shared by the interpreted eval
    * and the generated code, so the two paths are bit-identical by
    * construction and the arithmetic (index-order dot, one factor,
    * per-element subtract) matches both the HOF formulation it replaces
    * and the oracle's replay term for term.
    */
  case class HouseholderChain(child: Expression, us: Seq[Seq[Double]])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType | DoubleType, _)
          if us.nonEmpty && us.forall(u => u.length == us.head.length &&
            u.exists(_ != 0.0)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case ArrayType(FloatType | DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            "householder_chain: reflection vectors must be non-empty, " +
              "equal-length and nonzero")
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"householder_chain expects array<float|double>, got $other")
      }

    @transient private lazy val uArrs: Array[Array[Double]] =
      us.map(_.toArray).toArray
    // integer-valued squares summed in doubles stay < 2^53: exact, and
    // identical to the driver-side Long sum the HOF formulation used
    @transient private lazy val uus: Array[Double] =
      uArrs.map(u => u.map(x => x * x).sum)
    private def isFloat: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def nullSafeEval(input: Any): Any = {
      val k = HouseholderKernel.instance
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        k.chain(k.toDoubles(input.asInstanceOf[ArrayData], isFloat),
          uArrs, uus))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val usRef = ctx.addReferenceObj("hhUs", uArrs, "double[][]")
      val uusRef = ctx.addReferenceObj("hhUus", uus, "double[]")
      val kernelRef = ctx.addReferenceObj("hhKernel", HouseholderKernel.instance,
        "graft.functions.HouseholderKernel")
      nullSafeCodeGen(ctx, ev, a => {
        s"""
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  $kernelRef.chain($kernelRef.toDoubles($a, $isFloat), $usRef, $uusRef));
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "householder_chain"
  }

  def householderChain(a: Column, us: Seq[Seq[Double]]): Column =
    toColumn(HouseholderChain(exprOf(a), us))

  /** Asymmetric binary score (Jégou et al.'s asymmetric-distance idea
    * applied to the 1-bit tier): the QUERY stays at full precision —
    * quantized to the SQ8 integer grid so the arithmetic is exact —
    * while the corpus side contributes only its packed sign words:
    * `Σ_i qq_i · (bit_i ? +1 : −1)`. Same storage as symmetric Hamming,
    * strictly more information used per comparison (Hamming collapses
    * the query to its signs too). One kernel pass per candidate pair,
    * shared by the interpreted eval and the generated code
    * (HouseholderChain's discipline); exact integer output (|qq| ≤ 127,
    * dim ≤ 4096 ⇒ |score| ≤ 520k), so ranking replays in the oracle
    * with zero float ambiguity.
    */
  case class BinaryAsymScore(left: Expression, right: Expression, dim: Int)
      extends BinaryExpression {
    require(dim >= 1 && dim <= 4096, s"dim $dim out of range (1..4096)")
    override def dataType: DataType = LongType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(e: Expression) = e.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      }
      if (ok(left) && ok(right))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"binary_asym_score expects (array<bigint> quantized query, " +
          s"array<bigint> packed sign words), got ${left.dataType} / ${right.dataType}")
    }

    override def nullSafeEval(q: Any, w: Any): Any =
      java.lang.Long.valueOf(BinaryAsymKernel.instance.score(
        q.asInstanceOf[ArrayData], w.asInstanceOf[ArrayData], dim))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val kernelRef = ctx.addReferenceObj("asymKernel",
        BinaryAsymKernel.instance, "graft.functions.BinaryAsymKernel")
      nullSafeCodeGen(ctx, ev, (q, w) => {
        s"${ev.value} = $kernelRef.score($q, $w, $dim);"
      })
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): BinaryAsymScore =
      copy(left = l, right = r)
    override def prettyName: String = "binary_asym_score"
  }

  def binaryAsymScore(qq: Column, words: Column, dim: Int): Column =
    toColumn(BinaryAsymScore(exprOf(qq), exprOf(words), dim))

  /** Row-local unit normalization in ONE kernel pass. The HOF
    * formulation (`transform(e, x => x / sqrt(aggregate(e, …)))`)
    * re-evaluates the norm subexpression — and EVERYTHING beneath it —
    * once per element (dim × dim × child cost per row, measured 15×+
    * on the pca3 chain); this expression computes the norm once and
    * divides, through one static kernel shared by interpreted eval and
    * generated code, arithmetic identical to the HOF term for term
    * (left-to-right square fold from 0.0, Math.sqrt, per-element
    * divide).
    */
  case class UnitNorm(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType | DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"unit_norm expects array<float|double>, got $other")
      }

    private def isFloat: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    override def nullSafeEval(input: Any): Any = {
      val k = HouseholderKernel.instance
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        k.unit(k.toDoubles(input.asInstanceOf[ArrayData], isFloat)))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val kernelRef = ctx.addReferenceObj("unKernel", HouseholderKernel.instance,
        "graft.functions.HouseholderKernel")
      nullSafeCodeGen(ctx, ev, a => {
        s"""
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
           |  $kernelRef.unit($kernelRef.toDoubles($a, $isFloat)));
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "unit_norm"
  }

  def unitNormalize(a: Column): Column = toColumn(UnitNorm(exprOf(a)))
}
