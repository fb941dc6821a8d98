package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Weighted priority-sampling primitives (Duffield–Lund–Thorup,
  * "Priority sampling for estimation of arbitrary subset sums",
  * JACM'07): each row gets priority q = w / u with u uniform in (0,1];
  * the k highest-priority rows form the sample, and
  * Ŵ = Σ_{i∈sample} max(w_i, τ) with τ = the (k+1)-th priority is an
  * unbiased estimator of the total weight.
  *
  * Determinism discipline: u is derived from the row's splitmix64 hash
  * (u = (⌊h/2^11⌋+1)/2^53 ∈ (0,1], so u's granularity is the 2^53
  * lattice) and the priority is computed in exact integer arithmetic —
  * q = ⌊w/u⌋ = ⌊w·2^53 / (⌊h/2^11⌋+1)⌋ as DECIMAL(38,0) — so the
  * DuckDB oracle replays every priority and the estimator bit-for-bit
  * in HUGEINT (floor division of non-negative operands agrees across
  * engines; IEEE doubles never enter the ordering).
  */
object PrioritySample {

  /** Priority q = ⌊w/u⌋ = ⌊w·2^53 / ((h >>> 11) + 1)⌋ of a row with
    * 64-bit hash `h` and positive integer weight `w`, as DECIMAL(38,0)
    * (the quotient exceeds LongType range when u is tiny: up to w·2^53).
    */
  def weightedPriority(hash: Column, weight: Column): Column =
    toColumn(WeightedPriorityExpr(exprOf(hash), exprOf(weight)))

  /** ⌊q·2^64 / max(n, 1)⌋ as DECIMAL(38,0) — the keep-threshold of a
    * rate-`q/n` hash-gate sample on the u64 lattice: keep a row iff its
    * unsigned 64-bit hash is below the threshold. When q ≥ n the
    * threshold passes every hash (keep-all), so no explicit cap is
    * needed. DuckDB replays as `(q::HUGEINT << 64) // greatest(n, 1)`.
    */
  def shl64Div(q: Column, n: Column): Column =
    toColumn(Shl64FloorDivExpr(exprOf(q), exprOf(n)))

  /** ⌊a / b⌋ of two non-negative DECIMAL(38,0) values (b ≥ 1) — exact
    * BigInteger floor division, the inverse-probability unscaling of
    * coordinated-sample estimators. DuckDB replays as HUGEINT `//`.
    */
  def floorDiv(a: Column, b: Column): Column =
    toColumn(DecimalFloorDivExpr(exprOf(a), exprOf(b)))
}

/** See [[PrioritySample.weightedPriority]]. */
case class WeightedPriorityExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DecimalType(38, 0)

  override def nullSafeEval(h: Any, w: Any): Any = {
    val hash = h.asInstanceOf[Long]
    val weight = w match {
      case l: Long => l
      case i: Int => i.toLong
      case other => throw new IllegalArgumentException(
        s"weight must be integral, got ${other.getClass}")
    }
    require(weight > 0, s"priority sampling needs a positive weight, got $weight")
    val u53 = (hash >>> 11) + 1L // in [1, 2^53]
    val q = (BigInt(weight) << 53) / BigInt(u53)
    Decimal(scala.math.BigDecimal(q), 38, 0)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): WeightedPriorityExpr =
    copy(left = l, right = r)
  override def prettyName: String = "weighted_priority"
}

/** See [[PrioritySample.shl64Div]]. */
case class Shl64FloorDivExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DecimalType(38, 0)

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case other => throw new IllegalArgumentException(
      s"shl64_div needs integral inputs, got ${other.getClass}")
  }

  override def nullSafeEval(q: Any, n: Any): Any = {
    val quota = asLong(q)
    require(quota >= 0, s"quota must be non-negative, got $quota")
    val denom = math.max(asLong(n), 1L)
    Decimal(scala.math.BigDecimal((BigInt(quota) << 64) / BigInt(denom)), 38, 0)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Shl64FloorDivExpr =
    copy(left = l, right = r)
  override def prettyName: String = "shl64_div"
}

/** See [[PrioritySample.floorDiv]]. */
case class DecimalFloorDivExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DecimalType(38, 0)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val num = a.asInstanceOf[Decimal].toJavaBigDecimal.toBigInteger
    val den = b.asInstanceOf[Decimal].toJavaBigDecimal.toBigInteger
    require(num.signum() >= 0 && den.signum() > 0,
      s"floor_div expects a >= 0, b >= 1; got $num / $den")
    Decimal(scala.math.BigDecimal(new java.math.BigDecimal(num.divide(den))), 38, 0)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DecimalFloorDivExpr =
    copy(left = l, right = r)
  override def prettyName: String = "floor_div"
}
