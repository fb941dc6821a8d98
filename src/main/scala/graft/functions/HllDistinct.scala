package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** HyperLogLog distinct-count sketch as a `TypedImperativeAggregate`
  * (Flajolet et al., AofA'07) — the register-array sibling of
  * [[KmvDistinct]]: FIXED 2^p bytes of state per group at ANY
  * cardinality (KMV's TreeSet grows to k entries), merge = element-wise
  * register MAX (order-free, idempotent — safe under retries and
  * arbitrary partial-aggregation trees, the 100 TB shuffle shape).
  *
  * Deterministic end to end: items hash through the engine's canonical
  * [[Sketches.hashValue]] chain, register j keeps the max
  * leading-zero rank of the hashes routed to it (both order-free), and
  * the estimator is a fixed-op-order float expression over an EXACT
  * integer register sum — the DuckDB oracle replays hash, registers,
  * harmonic sum and the small-range correction bit for bit.
  *
  * Estimator: E = α_m·m²/Σ 2^(−M_j), with the Σ computed exactly as
  * the integer Σ 2^(cap−M_j) (cap = 64−p+1) and divided once, and the
  * linear-counting fallback E = m·ln(m/V) when E ≤ 2.5m with V empty
  * registers (the standard small-range correction; the 64-bit hash
  * makes the large-range correction unnecessary). α_m uses the closed
  * form 0.7213/(1+1.079/m), so `p` ≥ 7 (the small-m special cases
  * would fork the oracle's formula).
  */
case class HllDistinct(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 7 && p <= 16, s"precision p=$p out of range (7..16)")

  private val m = 1 << p
  private val cap = 64 - p + 1

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Sketches.hashValue(v)
      val bucket = (h >>> (64 - p)).toInt
      val w = h << p
      val rho = math.min(cap, java.lang.Long.numberOfLeadingZeros(w) + 1)
      if (rho > (buf(bucket) & 0xff)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) {
      if ((other(j) & 0xff) > (buf(j) & 0xff)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    java.lang.Long.valueOf(HllDistinct.estimate(buf, p))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "hll_distinct"
}

object HllDistinct {
  /** Approximate COUNT(DISTINCT c) with 2^p bytes of state per group,
    * mergeable by register max (typical error ≈ 1.04/√(2^p)).
    */
  def hllDistinct(c: Column, p: Int = 12): Column =
    toColumn(HllDistinct(exprOf(c), p).toAggregateExpression())

  /** The register array itself (binary, 2^p bytes) — for PERSISTED
    * sketch tables: store per-(group, window) registers once, then
    * roll up any coarser grouping with [[HllMerge.hllMergeEstimate]]
    * WITHOUT re-reading raw data. Register max is associative and
    * commutative, so a merged rollup is bit-identical to the direct
    * sketch over the union — the property the merge gate pins.
    */
  def hllRegisters(c: Column, p: Int = 12): Column =
    toColumn(HllRegisters(exprOf(c), p).toAggregateExpression())

  /** `HllDistinct.eval` over a raw register array — shared by the
    * direct aggregate and the merge-of-stored-sketches path.
    */
  private[functions] def estimate(buf: Array[Byte], p: Int): Long = {
    val m = 1 << p
    val cap = 64 - p + 1
    // exact integer harmonic sum: Σ_j 2^(cap - M_j) — order-free, so
    // the float division below sees ONE exactly-agreed operand
    var sInt = BigInt(0)
    var zeros = 0
    var j = 0
    while (j < m) {
      val mj = buf(j) & 0xff
      if (mj == 0) zeros += 1
      sInt += BigInt(1) << (cap - mj)
      j += 1
    }
    // fixed op order, mirrored literally by the oracle SQL:
    // (0.7213 / (1 + 1.079/m)) * m * m * 2^cap / S
    val md = m.toDouble
    val eRaw = 0.7213 / (1.0 + 1.079 / md) * md * md *
      math.pow(2.0, cap.toDouble) / sInt.doubleValue
    val e =
      if (eRaw <= 2.5 * md && zeros > 0) md * math.log(md / zeros.toDouble)
      else eRaw
    math.round(e)
  }
}

/** [[HllDistinct]]'s accumulation with the REGISTERS as the result
  * (binary, 2^p bytes) — the persisted-sketch-table building block.
  */
case class HllRegisters(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 7 && p <= 16, s"precision p=$p out of range (7..16)")

  private val m = 1 << p
  private val cap = 64 - p + 1

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Sketches.hashValue(v)
      val bucket = (h >>> (64 - p)).toInt
      val rho = math.min(cap, java.lang.Long.numberOfLeadingZeros(h << p) + 1)
      if (rho > (buf(bucket) & 0xff)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) {
      if ((other(j) & 0xff) > (buf(j) & 0xff)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "hll_registers"
}

/** Merge STORED register arrays (element-wise max) and estimate — the
  * rollup side of the persisted sketch table: per-fine-group sketches
  * written once, any coarser distinct count answered from sketch rows
  * alone. Bit-identical to running [[HllDistinct]] directly over the
  * union of the fine groups' raw rows (max is associative/commutative
  * and the estimator is a pure function of the merged registers).
  */
case class HllMerge(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 7 && p <= 16, s"precision p=$p out of range (7..16)")

  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val regs = v.asInstanceOf[Array[Byte]]
      require(regs.length == m,
        s"register blob has ${regs.length} registers, sketch expects $m")
      merge(buf, regs)
    } else buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < m) {
      if ((other(j) & 0xff) > (buf(j) & 0xff)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    java.lang.Long.valueOf(HllDistinct.estimate(buf, p))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "hll_merge"
}

object HllMerge {
  /** Estimate a distinct count from stored [[HllDistinct.hllRegisters]]
    * blobs — merge by register max, then the shared estimator.
    */
  def hllMergeEstimate(c: Column, p: Int = 12): Column =
    toColumn(HllMerge(exprOf(c), p).toAggregateExpression())

  /** Row-local register union (element-wise max) of two stored blobs —
    * the set-operation building block: `union(A, B)` IS the sketch of
    * the multiset union, so `|A| + |B| − |A∪B|` (inclusion–exclusion
    * over three [[hllEstimate]] readouts) estimates the OVERLAP of two
    * corpora from sketch rows alone, no raw re-scan and no exact join.
    */
  def hllUnion(a: Column, b: Column): Column =
    toColumn(HllUnionExpr(exprOf(a), exprOf(b)))

  /** Row-local estimate readout of one stored register blob — the
    * aggregate-free sibling of [[hllMergeEstimate]] for expressions
    * over already-joined sketch rows (overlap matrices, pair frames).
    */
  def hllEstimate(c: Column, p: Int = 12): Column =
    toColumn(HllEstimateExpr(exprOf(c), p))
}

/** Element-wise register max of two blobs — see [[HllMerge.hllUnion]]. */
case class HllUnionExpr(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    require(x.length == y.length,
      s"register blobs disagree on precision: ${x.length} vs ${y.length} registers")
    val out = new Array[Byte](x.length)
    var j = 0
    while (j < x.length) {
      out(j) = if ((y(j) & 0xff) > (x(j) & 0xff)) y(j) else x(j)
      j += 1
    }
    out
  }
  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression): HllUnionExpr =
    copy(left = l, right = r)
  override def prettyName: String = "hll_union"
}

/** Row-local `HllDistinct.estimate` over one stored register blob. */
case class HllEstimateExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression, p: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(p >= 7 && p <= 16, s"precision p=$p out of range (7..16)")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val regs = input.asInstanceOf[Array[Byte]]
    require(regs.length == (1 << p),
      s"register blob has ${regs.length} registers, p=$p expects ${1 << p}")
    java.lang.Long.valueOf(HllDistinct.estimate(regs, p))
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): HllEstimateExpr =
    copy(child = c)
  override def prettyName: String = "hll_estimate"
}
