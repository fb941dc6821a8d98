package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k as a `TypedImperativeAggregate`.
  *
  * Input is a struct whose FIRST field is a double score; the aggregate
  * keeps the k best rows (score descending, remaining fields ascending as
  * the deterministic tiebreak) and returns them as a sorted array.
  *
  * This is the scale-correct shape for per-group top-k (e.g. kNN result
  * assembly): map-side partial aggregation keeps k rows per group per
  * partition and shuffles only those, versus a `row_number()` window that
  * funnels EVERY candidate row of a group through one reducer — for
  * brute-force kNN that is the whole corpus per query. State is k rows
  * regardless of input size, and merges are k-way bounded — the same
  * 100 TB discipline as the reference's aggregation pushdown contract
  * (`AggregateQuerySuite.scala` semantics re-expressed Spark-native).
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[InternalRow]] {

  require(k >= 1, "k must be >= 1")

  private lazy val structType: StructType = child.dataType match {
    case st: StructType =>
      require(st.fields.nonEmpty && st.fields.head.dataType == DoubleType,
        s"top_k input must be a struct with a leading double score, got $st")
      st
    case other => throw new IllegalArgumentException(s"top_k input must be a struct, got $other")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)

  /** best-first: score desc, then remaining fields asc (total order). */
  private lazy val bestFirst: Ordering[InternalRow] = {
    val orders = SortOrder(BoundReference(0, DoubleType, nullable = false), Descending) +:
      structType.fields.zipWithIndex.drop(1).map { case (f, i) =>
        SortOrder(BoundReference(i, f.dataType, f.nullable), Ascending)
      }.toSeq
    new InterpretedOrdering(orders)
  }

  /** heap with the WORST retained row at the head (so it pops first). */
  override def createAggregationBuffer(): java.util.PriorityQueue[InternalRow] =
    new java.util.PriorityQueue[InternalRow](k, bestFirst.reverse)

  private def offer(buf: java.util.PriorityQueue[InternalRow], row: InternalRow): Unit = {
    if (buf.size < k) buf.add(row.copy())
    else if (bestFirst.compare(row, buf.peek()) < 0) {
      buf.poll()
      buf.add(row.copy())
    }
  }

  override def update(buf: java.util.PriorityQueue[InternalRow], input: InternalRow): java.util.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0)) offer(buf, row)
    }
    buf
  }

  override def merge(buf: java.util.PriorityQueue[InternalRow], other: java.util.PriorityQueue[InternalRow]): java.util.PriorityQueue[InternalRow] = {
    other.forEach(r => offer(buf, r))
    buf
  }

  override def eval(buf: java.util.PriorityQueue[InternalRow]): Any = {
    val arr = new Array[InternalRow](buf.size)
    var i = buf.size - 1
    // heap pops worst-first; fill back-to-front for best-first output
    while (i >= 0) { arr(i) = buf.poll(); i -= 1 }
    arr.foreach(r => buf.add(r)) // restore (eval must not destroy the buffer)
    new GenericArrayData(arr.sorted(bestFirst).toArray[Any])
  }

  private lazy val proj = UnsafeProjection.create(structType)

  override def serialize(buf: java.util.PriorityQueue[InternalRow]): Array[Byte] = {
    val rows = new scala.collection.mutable.ArrayBuffer[Array[Byte]](buf.size)
    buf.forEach { r =>
      val ur = proj(r)
      rows += java.util.Arrays.copyOfRange(ur.getBytes, 0, ur.getSizeInBytes)
    }
    val bb = ByteBuffer.allocate(4 + rows.map(_.length + 4).sum)
    bb.putInt(rows.length)
    rows.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[InternalRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      val ur = new UnsafeRow(structType.length)
      ur.pointTo(b, len)
      buf.add(ur)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "top_k"
}

object BoundedTopK {
  /** Top-k rows per group: `c` a struct with a leading double score;
    * returns the k best as a sorted array (score desc, tiebreak asc).
    */
  def topK(c: Column, k: Int): Column =
    toColumn(BoundedTopK(exprOf(c), k).toAggregateExpression())
}
