package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count-Min frequency sketch as a `TypedImperativeAggregate` (Cormode
  * & Muthukrishnan, J. Algorithms 2005) — the frequency sibling of
  * [[HllDistinct]]/[[KmvDistinct]]: `depth·width` long counters per
  * group at ANY input size, merged by element-wise ADD (exact integer
  * sums — order-free, so partial aggregation, shuffle combining and
  * retries are all safe by construction).
  *
  * Deterministic end to end: items hash once through the canonical
  * [[Sketches.hashValue]], row `r` re-scrambles with a fixed literal
  * seed (`rowSeed(r)` — plan-time constants the oracle embeds) and
  * takes the low bits as its bucket (`width` is a power of two, so the
  * unsigned mod is a mask both engines agree on). Counters are exact
  * integer sums of occurrence counts; the estimate for an item is the
  * MIN of its `depth` counters (never an under-count; over-counts
  * bounded by 2N/width with probability 1−2^−depth). Every step
  * replays in DuckDB.
  *
  * At 100 TB this is the heavy-hitter shape: the sketch aggregate
  * map-side combines to a fixed `depth·width·8`-byte state per
  * partition, where an exact `GROUP BY term` shuffles every distinct
  * term. Estimation is a broadcast of the one-row sketch plus a
  * row-local lookup.
  *
  * Emitted sketch arrays carry a two-cell `[depth, width]` geometry
  * header before the counters: the total cell count alone does NOT
  * determine the layout ((1,1024), (2,512), (4,256) and (8,128) all
  * have 1024 cells), so a stored counter table built at one geometry
  * must fail LOUD — not silently misalign rows — when merged under
  * another. [[CmsMerge]] requires an exact header match;
  * [[CmsSketch.cmsEstimate]] skips the header when indexing.
  */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 8, s"depth $depth out of range (1..8)")
  require(width >= 8 && width <= 65536 && (width & (width - 1)) == 0,
    s"width $width must be a power of two in 8..65536")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Sketches.hashValue(v)
      var r = 0
      while (r < depth) {
        val b = (Sketches.splitmix64(h ^ CmsSketch.rowSeed(r)) &
          (width - 1)).toInt
        buf(r * width + b) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(CmsSketch.withHeader(buf, depth, width))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "cms_sketch"
}

/** Merge STORED Count-Min counter tables (element-wise add — exact
  * integer sums, associative and commutative) back into one sketch:
  * the rollup side of a persisted frequency-sketch table, bit-identical
  * to building one sketch over the union of the fine groups' raw rows.
  */
case class CmsMerge(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 8, s"depth $depth out of range (1..8)")
  require(width >= 8 && width <= 65536 && (width & (width - 1)) == 0,
    s"width $width must be a power of two in 8..65536")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray()
      // exact geometry match on the header, NOT the cell count: all of
      // (1,1024), (2,512), (4,256), (8,128) have 1024 cells but align
      // rows differently — merging across geometries would silently
      // break the never-under-count invariant
      require(arr.length == buf.length + 2 &&
        arr(0) == depth.toLong && arr(1) == width.toLong,
        s"stored sketch geometry (depth=${arr.headOption.getOrElse(-1L)}, " +
          s"width=${arr.drop(1).headOption.getOrElse(-1L)}, " +
          s"${arr.length} cells incl. header) does not match " +
          s"cms_merge(depth=$depth, width=$width)")
      var i = 0
      while (i < buf.length) { buf(i) += arr(i + 2); i += 1 }
      buf
    } else buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(CmsSketch.withHeader(buf, depth, width))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "cms_merge"
}

object CmsSketch {
  /** Row-hash seeds — plan-time literals both engines embed. */
  def rowSeed(r: Int): Long = Sketches.splitmix64(0x436d734c69746572L + r)

  /** Counter cells preceded by the `[depth, width]` geometry header. */
  private[functions] def withHeader(
      counters: Array[Long], depth: Int, width: Int): Array[Long] = {
    val out = new Array[Long](counters.length + 2)
    out(0) = depth.toLong
    out(1) = width.toLong
    System.arraycopy(counters, 0, out, 2, counters.length)
    out
  }

  /** Merge stored counter tables back into one sketch (element-wise
    * add) — estimate from the result with [[cmsEstimate]].
    */
  def cmsMerge(c: Column, depth: Int = 4, width: Int = 256): Column =
    toColumn(CmsMerge(exprOf(c), depth, width).toAggregateExpression())

  /** Build the sketch: `depth·width` exact counters per group. */
  def cms(c: Column, depth: Int = 4, width: Int = 256): Column =
    toColumn(CmsSketch(exprOf(c), depth, width).toAggregateExpression())

  /** Point estimate from a built sketch: MIN over the item's `depth`
    * counters. `itemHash` must be the [[Sketches.hashValue]] of the
    * item — [[Sketches.splitmixLong]] for longs,
    * [[Sketches.stringHash64]] (seed 0x9747b28c) for strings — so the
    * lookup hashes exactly what the build hashed. Row-local (codegen'd
    * built-ins over the broadcast sketch array).
    */
  def cmsEstimate(sketch: Column, itemHash: Column,
      depth: Int, width: Int): Column = {
    // +2 skips the geometry header; least() needs >= 2 args, so a
    // depth-1 sketch reads its single cell directly
    val cells = (0 until depth).map { r =>
      element_at(sketch,
        (lit(r * width + 2) +
          Sketches.splitmixLong(itemHash.bitwiseXOR(lit(rowSeed(r))))
            .bitwiseAND(lit((width - 1).toLong)) + lit(1L)).cast("int"))
    }
    if (depth == 1) cells.head else least(cells: _*)
  }
}
