package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Mergeable quantile sketch over long values — the KLL-family member
  * of the sketch matrix ([[KmvDistinct]]/[[HllDistinct]] distinct,
  * [[CmsSketch]] frequency, this one rank/quantile): bounded state per
  * group at ANY input size, order-free merge, and — unusually for a
  * quantile sketch — a BIT-IDENTICAL rollup guarantee, which is what
  * makes a persisted sketch table with an exact DuckDB oracle possible.
  *
  * Construction (the mergeable random-sample quantile summary of
  * Agarwal et al., "Mergeable Summaries", PODS'12, with KLL's
  * level-geometric retention — Karnin/Lang/Liberty, FOCS'16 — driven by
  * HASH coins instead of RNG coins): a value `v` carries the
  * deterministic coin sequence of its hash `h = splitmix64(v)`; it
  * survives at level `l` iff the low `l` bits of `h` are zero
  * (trailing-zeros(h) >= l, a geometric(1/2) level). The sketch at
  * level `l` keeps every surviving distinct value WITH ITS EXACT
  * count; when the survivor set exceeds the capacity `k`, the level
  * escalates by one and re-filters (the compaction step — discard by
  * the next hash coin, not by position). A survivor at level `l`
  * represents its count at weight `2^l`, so for any value range the
  * estimated mass Σ c_v·2^l is unbiased, and quantiles read off the
  * weighted cumulative order with integer-exact rank arithmetic.
  *
  * Why rollup ≡ direct, bit for bit (the property the merge gate pins,
  * and the reason levels are hash-coins rather than RNG): survivor
  * counts are monotone under sub-multisets — for any multisets
  * `A ⊆ B`, `|{v ∈ A : tz(h(v)) >= l}| <= |{v ∈ B : tz(h(v)) >= l}|` —
  * so a sketch over ANY subset escalates to at most the union's final
  * level `L* = min { l : |{v : tz(h(v)) >= l}| <= k }`. Merging
  * re-filters at the max operand level (no information is lost:
  * operands retain every survivor at their own level, a superset of
  * the union-level survivors) and escalates only while forced, so any
  * partial-aggregation tree, shuffle order, micro-batch chop, or
  * persisted fine/coarse split lands on exactly
  * `(L*, {(v, total count of v) : tz(h(v)) >= L*})` — a pure function
  * of the input multiset. The canonical blob sorts survivors by value,
  * so equality is byte equality.
  *
  * Blob layout (the persisted-sketch-table format, geometry header
  * first like [[CmsSketch]]'s post-round-13 arrays): big-endian longs
  * `[k, level, n_total, nSurvivors, v_1, c_1, …, v_n, c_n]` with
  * values ascending; `n_total` is the EXACT input count (an order-free
  * sum, so it stays exact through any rollup — the blob doubles as a
  * count sketch, and `n_total` vs the survivors' estimated mass
  * `Σ c·2^level` is the built-in calibration diagnostic).
  * [[KllMerge]] requires an exact `k` match — capacities do not mix
  * (different `k` ⇒ different escalation points ⇒ the merged state
  * would be neither operand's contract).
  *
  * At 100 TB this is the right shape for length/score distribution
  * dashboards: an exact per-group quantile shuffles every value; this
  * aggregate map-side combines to <= `k` (value, count) pairs per
  * partition and merges order-free, and a persisted per-(group, window)
  * sketch table answers any coarser quantile from sketch rows alone.
  *
  * Error model — the price of bit-exact mergeability, stated plainly:
  * the level-`L*` survivor set is a 2^-L* hash sample of the DISTINCT
  * values (surviving counts stay exact; a dropped value's whole count
  * is gone), so rank error concentrates at O(1/sqrt(k)) when per-value
  * masses are small (the length/score-distribution shape this is for)
  * but is dominated by `max_v c_v / n` when single values carry a
  * constant mass fraction — a point mass of 30% of the input rides one
  * hash coin. Occurrence-level sampling (true KLL compaction) would fix
  * that at the cost of order-DEPENDENT state, which would forfeit the
  * bit-identical rollup and the exact oracle; duplicate-heavy domains
  * should raise `k` (survival prob is `~k/ndv`) or track the heavy
  * hitters with the [[CmsSketch]] the matrix pairs this with.
  */
case class KllSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllSketch.Buf] {

  require(k >= 16 && k <= 65536, s"capacity k=$k out of range (16..65536)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllSketch.Buf = new KllSketch.Buf(0)

  override def update(buf: KllSketch.Buf, input: InternalRow): KllSketch.Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], 1L, k)
    buf
  }

  override def merge(buf: KllSketch.Buf, other: KllSketch.Buf): KllSketch.Buf =
    buf.mergeIn(other, k)

  override def eval(buf: KllSketch.Buf): Any = buf.toBlob(k)

  override def serialize(buf: KllSketch.Buf): Array[Byte] = buf.toBlob(k)
  override def deserialize(bytes: Array[Byte]): KllSketch.Buf =
    KllSketch.Buf.fromBlob(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kll_sketch"
}

object KllSketch {

  /** Mutable survivor set: escalation-minimal level + exact counts of
    * the values whose hash coins survive it.
    */
  final class Buf(var level: Int) {
    val counts = new java.util.HashMap[Long, Long]()
    var total: Long = 0L

    private def survives(v: Long, l: Int): Boolean =
      java.lang.Long.numberOfTrailingZeros(Sketches.splitmix64(v)) >= l

    /** Escalate while over capacity — each step discards by the next
      * hash coin, so the state stays the pure function
      * `(min level with <= k survivors, survivors at it)`.
      */
    private def compact(k: Int): Unit = {
      while (counts.size > k) {
        level += 1
        val it = counts.keySet().iterator()
        while (it.hasNext) if (!survives(it.next(), level)) it.remove()
      }
    }

    def add(v: Long, c: Long, k: Int): Buf = {
      total += c
      if (survives(v, level)) {
        counts.merge(v, c, (a, b) => a + b)
        compact(k)
      }
      this
    }

    def mergeIn(other: Buf, k: Int): Buf = {
      total += other.total
      if (other.level > level) {
        level = other.level
        val it = counts.keySet().iterator()
        while (it.hasNext) if (!survives(it.next(), level)) it.remove()
      }
      val oit = other.counts.entrySet().iterator()
      while (oit.hasNext) {
        val e = oit.next()
        if (survives(e.getKey, level))
          counts.merge(e.getKey, e.getValue, (a, b) => a + b)
      }
      compact(k)
      this
    }

    /** Canonical blob: `[k, level, n_total, nSurv, (v, c)*]` with
      * values ascending — byte-equal iff the sketches are equal.
      */
    def toBlob(k: Int): Array[Byte] = {
      val vs = new Array[Long](counts.size)
      val it = counts.keySet().iterator()
      var i = 0
      while (it.hasNext) { vs(i) = it.next(); i += 1 }
      java.util.Arrays.sort(vs)
      val bb = java.nio.ByteBuffer.allocate((4 + 2 * vs.length) * 8)
      bb.putLong(k.toLong).putLong(level.toLong).putLong(total)
        .putLong(vs.length.toLong)
      vs.foreach { v => bb.putLong(v).putLong(counts.get(v)) }
      bb.array()
    }
  }

  object Buf {
    def fromBlob(bytes: Array[Byte], k: Int): Buf = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val blobK = bb.getLong
      require(blobK == k.toLong,
        s"stored KLL sketch has capacity k=$blobK, merge expects k=$k " +
          "(capacities set the escalation points and do not mix)")
      val buf = new Buf(bb.getLong.toInt)
      buf.total = bb.getLong
      val n = bb.getLong.toInt
      var i = 0
      while (i < n) { buf.counts.put(bb.getLong, bb.getLong); i += 1 }
      buf
    }
  }

  /** Build the sketch blob over a long column — the persisted-quantile-
    * table building block ([[HllDistinct.hllRegisters]]'s analog).
    */
  def kll(c: Column, k: Int = 256): Column =
    toColumn(KllSketch(exprOf(c), k).toAggregateExpression())

  /** Merge STORED sketch blobs back into one — the rollup side: any
    * coarser grouping's quantiles answered from sketch rows alone,
    * bit-identical to the direct sketch over the raw union.
    */
  def kllMerge(c: Column, k: Int = 256): Column =
    toColumn(KllMerge(exprOf(c), k).toAggregateExpression())

  /** Quantile estimate from a sketch blob: the first survivor value (in
    * ascending order) whose cumulative weight `Σ c·2^level` reaches
    * `pct`% of the total — integer-exact rank arithmetic, so the oracle
    * replays the selection bit for bit. NULL on an empty sketch.
    */
  def kllQuantile(blob: Column, pct: Int): Column =
    toColumn(KllQuantileExpr(exprOf(blob), pct))

  /** The blob's EXACT input count (an order-free sum, exact through any
    * rollup) — the sketch doubles as a count rollup, and `n` vs the
    * estimated mass is the calibration diagnostic.
    */
  def kllN(blob: Column): Column = toColumn(KllNExpr(exprOf(blob)))

  /** Estimated permille rank of `probe` in the sketched distribution —
    * see [[KllRankExpr]].
    */
  def kllRankMilli(blob: Column, probe: Column): Column =
    toColumn(KllRankExpr(exprOf(blob), exprOf(probe)))
}

/** Merge stored [[KllSketch]] blobs (the rollup aggregate). Confluent
  * by the same argument as the build aggregate: operands retain every
  * survivor at their own level, so re-filtering at the running max
  * level and escalating only while over capacity lands on the identical
  * pure-function state regardless of merge order or tree shape.
  */
case class KllMerge(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllSketch.Buf] {

  require(k >= 16 && k <= 65536, s"capacity k=$k out of range (16..65536)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllSketch.Buf = new KllSketch.Buf(0)

  override def update(buf: KllSketch.Buf, input: InternalRow): KllSketch.Buf = {
    val v = child.eval(input)
    if (v != null)
      buf.mergeIn(KllSketch.Buf.fromBlob(v.asInstanceOf[Array[Byte]], k), k)
    else buf
  }

  override def merge(buf: KllSketch.Buf, other: KllSketch.Buf): KllSketch.Buf =
    buf.mergeIn(other, k)

  override def eval(buf: KllSketch.Buf): Any = buf.toBlob(k)

  override def serialize(buf: KllSketch.Buf): Array[Byte] = buf.toBlob(k)
  override def deserialize(bytes: Array[Byte]): KllSketch.Buf =
    KllSketch.Buf.fromBlob(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kll_merge"
}

/** Row-local quantile readout over a sketch blob (any blob the build or
  * merge aggregates emit): survivors are already value-sorted in the
  * canonical layout, so one pass accumulates `cum = Σ c·2^level` and
  * returns the first value with `cum·100 >= pct·W` — all exact long
  * arithmetic (weights fit comfortably: counts and 2^level are bounded
  * by the input size).
  */
case class KllQuantileExpr(child: Expression, pct: Int)
    extends UnaryExpression with CodegenFallback {

  require(pct >= 1 && pct <= 100, s"pct=$pct out of range (1..100)")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bb = java.nio.ByteBuffer.wrap(input.asInstanceOf[Array[Byte]])
    bb.getLong // k (header)
    val level = bb.getLong.toInt
    bb.getLong // n_total (exact count — read via KllNExpr)
    val n = bb.getLong.toInt
    if (n == 0) null
    else {
      // BigInt weights: c·2^level can exceed a long at extreme scale
      // (c <= N, 2^level ~ distinct/k)
      val vs = new Array[Long](n)
      val ws = new Array[BigInt](n)
      var w = BigInt(0)
      var i = 0
      while (i < n) {
        vs(i) = bb.getLong
        ws(i) = BigInt(bb.getLong) << level
        w += ws(i)
        i += 1
      }
      val target = BigInt(pct) * w
      var cum = BigInt(0)
      i = 0
      var out: java.lang.Long = null
      while (i < n && out == null) {
        cum += ws(i) * 100
        if (cum >= target) out = java.lang.Long.valueOf(vs(i))
        i += 1
      }
      out
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "kll_quantile"
}

/** Rank readout over a sketch blob: the estimated permille position of
  * a probe value in the sketched distribution —
  * `floor(1000 · Σ_{v <= probe} c·2^level / W)`, exact BigInt
  * arithmetic. The drift primitive: a window median's rank in the
  * CORPUS sketch says how far the window's distribution has shifted,
  * answered from two sketch rows. NULL on an empty sketch.
  */
case class KllRankExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(blob: Any, probe: Any): Any = {
    val bb = java.nio.ByteBuffer.wrap(blob.asInstanceOf[Array[Byte]])
    bb.getLong // k
    val level = bb.getLong.toInt
    bb.getLong // n_total
    val n = bb.getLong.toInt
    if (n == 0) null
    else {
      val p = probe.asInstanceOf[Long]
      var w = BigInt(0)
      var cum = BigInt(0)
      var i = 0
      while (i < n) {
        val v = bb.getLong
        val c = BigInt(bb.getLong) << level
        w += c
        if (v <= p) cum += c
        i += 1
      }
      java.lang.Long.valueOf(((cum * 1000) / w).toLong)
    }
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllRankExpr =
    copy(left = l, right = r)
  override def prettyName: String = "kll_rank_milli"
}

/** Exact input count carried in a sketch blob's header. */
case class KllNExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val bb = java.nio.ByteBuffer.wrap(input.asInstanceOf[Array[Byte]])
    bb.getLong // k
    bb.getLong // level
    java.lang.Long.valueOf(bb.getLong)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "kll_n"
}
