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
}
