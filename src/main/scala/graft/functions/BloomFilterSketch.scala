package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom filter over 64-bit hashes, as a `TypedImperativeAggregate` +
  * membership expression — the compact-broadcast set for "is this
  * shingle possibly in the benchmark?" style prefilters.
  *
  * Probe positions use Kirsch–Mitzenmacher double hashing (public
  * construction, "Less Hashing, Same Performance", ESA'06): `g_j(x) =
  * h1(x) + j·h2(x) mod m` with both base hashes derived from the input
  * via splitmix64 — membership is a pure function of the hash value, so
  * the filter built by any partitioning/merge order is bit-identical
  * (merges are bitset ORs, which commute).
  *
  * Scale stance: at 100 TB the exact distinct-shingle set of even an
  * eval benchmark is a multi-GB broadcast (8 B per shingle hash plus
  * join-map overhead); at ~10 bits/element a Bloom filter carries the
  * same no-false-negative prefilter in ~1/8th the bytes, and the
  * false-positive survivors die in the exact (and now much smaller)
  * verify join that follows. The aggregation buffer is `m/8` bytes per
  * partition regardless of input size.
  */
object BloomFilterSketch {

  // The packing layout lives in exactly these three helpers: probe
  // position j = h1 + j·h2 mod m (double hashing), word i serialized
  // big-endian at bytes [8i, 8i+8). No per-element allocation — these
  // run once per corpus shingle on the prefilter hot path.

  @inline private def probe(h1: Long, h2: Long, j: Int, numBits: Int): Int =
    java.lang.Long.remainderUnsigned(h1 + j.toLong * h2, numBits.toLong).toInt

  @inline private def baseHashes(hash: Long): (Long, Long) =
    (Sketches.splitmix64(hash), Sketches.splitmix64(hash ^ 0x9e3779b97f4a7c15L) | 1L)

  private[graft] def setBits(buf: Array[Long], hash: Long,
      numBits: Int, numHashes: Int): Unit = {
    val (h1, h2) = baseHashes(hash)
    var j = 0
    while (j < numHashes) {
      val bit = probe(h1, h2, j, numBits)
      buf(bit >>> 6) |= 1L << (bit & 63)
      j += 1
    }
  }

  private[graft] def probeHit(bytes: Array[Byte], hash: Long,
      numBits: Int, numHashes: Int): Boolean = {
    val (h1, h2) = baseHashes(hash)
    var j = 0
    while (j < numHashes) {
      val bit = probe(h1, h2, j, numBits)
      // word i at bytes [8i, 8i+8) big-endian; bit k of the word is bit
      // (k & 7) of byte 7 - (k >>> 3) within it
      val b = bytes((bit >>> 6) * 8 + 7 - ((bit & 63) >>> 3))
      if (((b >> (bit & 7)) & 1) == 0) return false
      j += 1
    }
    true
  }

  /** Builds the `numBits`-wide filter over a LongType hash column;
    * evaluates to the packed bitset as BinaryType (`numBits/8` bytes).
    */
  case class BloomAgg(
      child: Expression,
      numBits: Int,
      numHashes: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] {

    require(numBits >= 64 && numBits % 64 == 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) setBits(buf, v.asInstanceOf[Long], numBits, numHashes)
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buf.length) { buf(i) |= other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any = {
      val bb = ByteBuffer.allocate(buf.length * 8)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def serialize(buf: Array[Long]): Array[Byte] = eval(buf).asInstanceOf[Array[Byte]]

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(bytes.length / 8)(bb.getLong)
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
    override def prettyName: String = "bloom_agg"
  }

  /** [[BloomAgg]] with the filter width arriving as a per-row LONG
    * column instead of a literal — the single-pass per-FILE-width build:
    * `groupBy(_file).agg(bloomAggVar(hash, width))` sizes every file's
    * filter from ITS row count (a driver-computed width joined in by
    * file), so a skewed table no longer pays the largest file's width
    * for every small file. The width must be group-constant: the buffer
    * allocates on the group's first row, an empty partial merges as
    * identity, and a width mismatch fails loudly rather than building a
    * filter that lies.
    */
  case class BloomAggVar(
      child: Expression,
      widthChild: Expression,
      numHashes: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] {

    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

    override def children: Seq[Expression] = Seq(child, widthChild)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    // empty = "no row seen yet"; real allocation happens on first update
    override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v == null) buf
      else {
        val w = widthChild.eval(input)
        require(w != null, "bloom_agg_var: width column must be non-null")
        val numBits = w.asInstanceOf[Long]
        require(numBits >= 64 && numBits % 64 == 0 && numBits <= Int.MaxValue,
          s"bloom_agg_var: width must be a positive multiple of 64 within Int range, got $numBits")
        val b = if (buf.length == 0) new Array[Long](numBits.toInt / 64) else buf
        require(b.length.toLong * 64 == numBits,
          s"bloom_agg_var: width $numBits differs within one group (have ${b.length * 64})")
        setBits(b, v.asInstanceOf[Long], numBits.toInt, numHashes)
        b
      }
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      if (other.length == 0) buf
      else if (buf.length == 0) other
      else {
        require(buf.length == other.length,
          s"bloom_agg_var: merging widths ${buf.length * 64} and ${other.length * 64}")
        var i = 0
        while (i < buf.length) { buf(i) |= other(i); i += 1 }
        buf
      }
    }

    override def eval(buf: Array[Long]): Any = {
      val bb = ByteBuffer.allocate(buf.length * 8)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def serialize(buf: Array[Long]): Array[Byte] = eval(buf).asInstanceOf[Array[Byte]]

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      Array.fill(bytes.length / 8)(bb.getLong)
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): BloomAggVar =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BloomAggVar =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren(0), widthChild = newChildren(1))
    override def prettyName: String = "bloom_agg_var"
  }

  /** Membership probe: bits BinaryType (from [[BloomAgg]]), hash
    * LongType. True ⇒ possibly present; false ⇒ DEFINITELY absent.
    */
  case class BloomMightContain(left: Expression, right: Expression,
      numBits: Int, numHashes: Int)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullSafeEval(bits: Any, hash: Any): Any =
      java.lang.Boolean.valueOf(probeHit(bits.asInstanceOf[Array[Byte]],
        hash.asInstanceOf[Long], numBits, numHashes))
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
    override def prettyName: String = "bloom_might_contain"
  }

  def bloomAgg(hash: Column, numBits: Int, numHashes: Int): Column =
    toColumn(BloomAgg(exprOf(hash), numBits, numHashes).toAggregateExpression())

  def bloomAggVar(hash: Column, numBits: Column, numHashes: Int): Column =
    toColumn(BloomAggVar(exprOf(hash), exprOf(numBits), numHashes).toAggregateExpression())

  def mightContain(bits: Column, hash: Column, numBits: Int, numHashes: Int): Column =
    toColumn(BloomMightContain(exprOf(bits), exprOf(hash), numBits, numHashes))

  /** Array-level probe: keep the string elements whose seeded hash might
    * be in the filter — ONE imperative eval per document instead of a
    * hash + probe expression pair per exploded shingle (the same
    * per-element-dispatch trade `FeatureBucketsExpr` makes).
    */
  case class BloomKeepStrings(left: Expression, right: Expression,
      numBits: Int, numHashes: Int, seed: Long)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false)
    override def nullSafeEval(bits: Any, arr: Any): Any = {
      val bytes = bits.asInstanceOf[Array[Byte]]
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = a.numElements()
      val out = new scala.collection.mutable.ArrayBuffer[Any](n)
      var i = 0
      while (i < n) {
        val s = a.getUTF8String(i)
        if (probeHit(bytes, Sketches.hashBytes(s.getBytes, seed), numBits, numHashes))
          out += s.clone() // detach from the (possibly reused) buffer
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
    override def prettyName: String = "bloom_keep_strings"
  }

  def keepStrings(bits: Column, arr: Column, numBits: Int, numHashes: Int,
      seed: Long): Column =
    toColumn(BloomKeepStrings(exprOf(bits), exprOf(arr), numBits, numHashes, seed))
}
