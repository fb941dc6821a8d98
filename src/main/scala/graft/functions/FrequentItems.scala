package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a `TypedImperativeAggregate`
  * (Misra & Gries, "Finding repeated elements", Sci. Comput. Program.
  * 1982; mergeability per Agarwal et al., "Mergeable summaries",
  * PODS'12).
  *
  * Tracks at most `k` candidate items with bounded-error counts: any item
  * with true frequency > N/k is guaranteed present. State is ≤ k
  * (string, long) pairs per group regardless of input size; partial
  * buffers merge by counter addition + decrement — the property that
  * makes it shuffle-safe at corpus scale (find boilerplate/spam tokens
  * over 100 TB without a full term count).
  *
  * Output: map<string, long> of surviving candidates and their
  * (undercounted by ≤ N/k) estimates.
  */
case class FrequentItems(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  require(k >= 1, "k must be >= 1")
  type Buf = scala.collection.mutable.HashMap[String, Long]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): Buf = scala.collection.mutable.HashMap.empty

  private def decrementAll(buf: Buf): Unit = {
    val dead = scala.collection.mutable.ArrayBuffer.empty[String]
    buf.keysIterator.foreach { key =>
      val c = buf(key) - 1
      if (c <= 0) dead += key else buf(key) = c
    }
    dead.foreach(buf.remove)
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      if (buf.contains(key)) buf(key) += 1
      else if (buf.size < k) buf(key) = 1
      else decrementAll(buf)
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    other.foreach { case (key, c) => buf(key) = buf.getOrElse(key, 0L) + c }
    // trim back to k by subtracting the (k+1)-th largest count (the
    // mergeable-summaries reduction)
    if (buf.size > k) {
      val counts = buf.values.toArray.sorted(Ordering[Long].reverse)
      val cut = counts(k)
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { key =>
        val c = buf(key) - cut
        if (c <= 0) dead += key else buf(key) = c
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val entries = buf.toSeq.sortBy { case (t, c) => (-c, t) }
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(entries.map(e => java.lang.Long.valueOf(e._2)).toArray[Any]))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) => out.writeUTF(key); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf(in.readUTF()) = in.readLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "frequent_items"
}

object FrequentItems {
  /** Heavy hitters: every item with frequency > total/k survives. */
  def frequentItems(c: Column, k: Int = 64): Column =
    toColumn(FrequentItems(exprOf(c), k).toAggregateExpression())
}
