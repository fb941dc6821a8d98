package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a
  * `TypedImperativeAggregate` (SURVEY.md §7 north-star: sketches as
  * custom Catalyst aggregates; estimator per Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM'02).
  *
  * Buffer = the k smallest 64-bit hashes seen (a sorted set). With fewer
  * than k values the count is exact; otherwise D ≈ (k-1)/U(k) where U(k)
  * is the k-th smallest hash normalized to [0,1). Buffers merge by set
  * union + trim — partial aggregation and shuffle-side combine work
  * exactly like any built-in aggregate, with k·8 bytes of state per
  * group regardless of input size (the 100 TB property).
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  require(k >= 2, "k must be >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  private def hashOf(v: Any): Long = Sketches.hashValue(v)

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long](java.lang.Long.compareUnsigned(_, _))

  override def update(buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(hashOf(v))
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[Long], other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    buf.addAll(other)
    while (buf.size > k) buf.pollLast()
    buf
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    if (buf.size < k) buf.size.toLong
    else {
      // k-th smallest unsigned hash normalized to (0,1)
      val kth = buf.last()
      val u = (kth >>> 11).toDouble / (1L << 53).toDouble
      math.round((k - 1) / math.max(u, Double.MinPositiveValue))
    }
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_distinct"
}

object KmvDistinct {
  /** Approximate COUNT(DISTINCT c) with k·8 bytes of state per group. */
  def kmvDistinct(c: Column, k: Int = 1024): Column =
    toColumn(KmvDistinct(exprOf(c), k).toAggregateExpression())

  /** The k smallest hashes themselves (unsigned-ascending array) — the
    * persisted-sketch-table form. Unlike HLL registers, a KMV synopsis
    * supports INTERSECTION estimation directly
    * ([[kmvIntersectEstimate]]), so a stored per-corpus minima table
    * answers overlap questions with better variance than HLL
    * inclusion–exclusion when the overlap is small relative to the
    * union (the differenced-estimates problem).
    */
  def kmvMinima(c: Column, k: Int = 1024): Column =
    toColumn(KmvMinima(exprOf(c), k).toAggregateExpression())

  /** |A∩B| from two stored [[kmvMinima]] arrays (Beyer et al., "On
    * synopses for distinct-value estimation under multiset operations",
    * SIGMOD'07): L = the k smallest of minA ∪ minB is exactly A∪B's
    * KMV synopsis, and for any h ∈ L, `h ∈ A ⟺ h ∈ minA` (h is below
    * L's k-th smallest, which is below minA's), so
    * `K∩ = |L ∩ minA ∩ minB|` is computable from the sketches alone.
    * Estimate: exact `K∩` when the union synopsis is under capacity
    * (both sketches then hold their COMPLETE hash sets); otherwise
    * `floor(K∩ · ((k−1)/u(kth of L)) / k + 0.5)` with
    * [[KmvDistinct]]'s exact normalization — fixed op order, replayed
    * by the oracle term for term.
    */
  def kmvIntersectEstimate(a: Column, b: Column, k: Int = 1024): Column =
    toColumn(KmvIntersectExpr(exprOf(a), exprOf(b), k))

  /** Merge stored minima arrays (set-union + trim — bit-identical to
    * the direct build over the raw union).
    */
  def kmvMergeMinima(c: Column, k: Int = 1024): Column =
    toColumn(KmvMergeMinima(exprOf(c), k).toAggregateExpression())

  /** Distinct-count readout of one stored minima array. */
  def kmvEstimate(c: Column, k: Int = 1024): Column =
    toColumn(KmvEstimateExpr(exprOf(c), k))
}

/** [[KmvDistinct]]'s accumulation with the MINIMA as the result
  * (array<long>, unsigned-ascending) — the persisted-sketch building
  * block for distinct counts AND set operations.
  */
case class KmvMinima(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  require(k >= 2, "k must be >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long](java.lang.Long.compareUnsigned(_, _))

  override def update(buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(Sketches.hashValue(v))
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[Long], other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    buf.addAll(other)
    while (buf.size > k) buf.pollLast()
    buf
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinima =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinima =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_minima"
}

/** Merge STORED [[KmvMinima]] arrays back into one synopsis — the
  * rollup aggregate: set-union the hashes, trim to the k smallest.
  * The k smallest of a union of k-min sets IS the k-min of the union
  * multiset, so the rollup is BIT-IDENTICAL to the direct build over
  * the raw union (pure function of the input multiset — the same
  * confluence discipline as [[HllMerge]]/`KllMerge`).
  */
case class KmvMergeMinima(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  require(k >= 2, "k must be >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long](java.lang.Long.compareUnsigned(_, _))

  override def update(buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray()
      require(arr.length <= k,
        s"stored minima array has ${arr.length} hashes, merge expects k<=$k " +
          "(synopses built at a larger capacity do not mix down)")
      arr.foreach(buf.add)
      while (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[Long], other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    buf.addAll(other)
    while (buf.size > k) buf.pollLast()
    buf
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeMinima =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeMinima =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_merge_minima"
}

/** Row-local distinct-count readout of one stored minima array —
  * `KmvDistinct.eval`'s exact arithmetic (size when under capacity,
  * else `round((k−1)/u(kth))`).
  */
case class KmvEstimateExpr(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 2, "k must be >= 2")
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    require(arr.length <= k,
      s"minima array has ${arr.length} hashes, estimator expects k<=$k")
    val est =
      if (arr.length < k) arr.length.toLong
      else {
        // the canonical layout is unsigned-ascending; last = kth
        val kth = arr(arr.length - 1)
        val u = (kth >>> 11).toDouble / (1L << 53).toDouble
        math.round((k - 1) / math.max(u, Double.MinPositiveValue))
      }
    java.lang.Long.valueOf(est)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "kmv_estimate"
}

/** Row-local intersection estimate over two stored minima arrays — see
  * [[KmvDistinct.kmvIntersectEstimate]].
  */
case class KmvIntersectExpr(
    left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 2, "k must be >= 2")
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val xs = a.asInstanceOf[ArrayData].toLongArray()
    val ys = b.asInstanceOf[ArrayData].toLongArray()
    require(xs.length <= k && ys.length <= k,
      s"minima arrays (${xs.length}, ${ys.length}) exceed k=$k — " +
        "sketches built at a larger capacity do not mix down")
    // L = k smallest (unsigned) of the union of the two minima sets
    val union = new java.util.TreeSet[Long](
      java.lang.Long.compareUnsigned(_, _))
    xs.foreach(union.add)
    ys.foreach(union.add)
    while (union.size > k) union.pollLast()
    val xset = xs.toSet
    val yset = ys.toSet
    var kBoth = 0L
    val it = union.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (xset.contains(h) && yset.contains(h)) kBoth += 1
    }
    val est =
      if (union.size < k) kBoth // complete synopses: exact intersection
      else {
        val kth = union.last()
        val u = (kth >>> 11).toDouble / (1L << 53).toDouble
        math.floor(
          kBoth.toDouble * ((k - 1) / math.max(u, Double.MinPositiveValue))
            / k + 0.5).toLong
      }
    java.lang.Long.valueOf(est)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KmvIntersectExpr =
    copy(left = l, right = r)
  override def prettyName: String = "kmv_intersect"
}
