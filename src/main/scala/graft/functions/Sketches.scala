package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.functions.{col => _, _}

/** Sketch expressions for near-duplicate detection at scale: MinHash
  * signatures (word-shingle Jaccard estimation), SimHash (cosine-ish bit
  * sketch), random-hyperplane LSH for embeddings, and winnowing
  * fingerprints. Each is a native Catalyst `Expression` (imperative inner
  * loop, CodegenFallback) — no Scala-UDF serialization, null-safe, usable
  * from both the Column API and SQL.
  *
  * All hashing is seeded splitmix64 (public construction, Steele et al.,
  * "Fast Splittable Pseudorandom Number Generators", OOPSLA'14) so
  * signatures are deterministic across runs/partitions — a hard
  * requirement for dedup joins over 100 TB (re-computed signatures must
  * be bit-identical on retry).
  */
object Sketches {

  @inline private[graft] def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** 64-bit hash of a byte range via splitmix-chained avalanche. */
  private[graft] def hashBytes(bytes: Array[Byte], seed: Long): Long = {
    var h = splitmix64(seed ^ bytes.length.toLong)
    var i = 0
    while (i + 8 <= bytes.length) {
      var block = 0L
      var j = 0
      while (j < 8) { block = (block << 8) | (bytes(i + j) & 0xffL); j += 1 }
      h = splitmix64(h ^ block)
      i += 8
    }
    var tail = 0L
    while (i < bytes.length) { tail = (tail << 8) | (bytes(i) & 0xffL); i += 1 }
    splitmix64(h ^ tail)
  }

  private[graft] def hashString(s: String, seed: Long): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  /** Canonical 64-bit hash of an aggregate input value — the shared
    * item hash of the distinct/frequency sketch family ([[KmvDistinct]],
    * [[HllDistinct]], [[CmsSketch]]): longs through [[splitmix64]],
    * strings/bytes through the seeded [[hashBytes]] chain the oracle
    * replays via `SketchOracleSql.hashStrCols`.
    */
  private[functions] def hashValue(v: Any): Long = v match {
    case s: org.apache.spark.unsafe.types.UTF8String =>
      hashBytes(s.getBytes, 0x9747b28cL)
    case l: Long => splitmix64(l)
    case i: Int => splitmix64(i.toLong)
    case d: Double => splitmix64(java.lang.Double.doubleToLongBits(d))
    case f: Float => splitmix64(java.lang.Float.floatToIntBits(f).toLong)
    case b: Boolean => splitmix64(if (b) 1L else 0L)
    case other => hashBytes(other.toString.getBytes("UTF-8"), 0x9747b28cL)
  }

  /** splitmix64 of a long column — the engine's canonical deterministic
    * hash for sampling/partitioning decisions that must be reproducible
    * across engines (unlike xxhash64, whose exact constants are Spark's).
    */
  case class SplitMix64Expr(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(splitmix64(input.asInstanceOf[Long]))
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "splitmix64"
  }

  def splitmixLong(c: Column): Column = toColumn(SplitMix64Expr(exprOf(c)))

  /** Seeded [[hashString]] of a string column — the engine's canonical
    * replayable hash for feature bucketing (hashed n-gram features, DSIR
    * importance weights). DuckDB replays it bit-for-bit via
    * `SketchOracleSql.hashStrCols`.
    */
  case class StringHash64Expr(child: Expression, seed: Long)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(
        hashBytes(input.asInstanceOf[UTF8String].getBytes, seed))
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "string_hash64"
  }

  def stringHash64(c: Column, seed: Long): Column =
    toColumn(StringHash64Expr(exprOf(c), seed))

  /** Hashed unigram+bigram feature buckets of a token array — the DSIR
    * featurization as ONE imperative eval per document (the per-feature
    * `transform(…, stringHash64)` HOF pays expression-tree dispatch per
    * feature; this loop hashes a 200-feature doc in one call, the same
    * trade [[MinHashSignature]] makes). Layout: unigram buckets in token
    * order, then adjacent-bigram buckets; bigram bytes are the exact
    * UTF-8 of `a + " " + b`, so the DuckDB replay hashes the same bytes.
    */
  case class FeatureBucketsExpr(child: Expression, buckets: Int, seed: Long)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = arr.numElements()
      val out = new Array[Int](if (n >= 2) 2 * n - 1 else n)
      var i = 0
      while (i < n) {
        out(i) = java.lang.Math.floorMod(
          hashBytes(arr.getUTF8String(i).getBytes, seed), buckets.toLong).toInt
        i += 1
      }
      i = 0
      while (i < n - 1) {
        val a = arr.getUTF8String(i).getBytes
        val b = arr.getUTF8String(i + 1).getBytes
        val bi = new Array[Byte](a.length + 1 + b.length)
        System.arraycopy(a, 0, bi, 0, a.length)
        bi(a.length) = ' '
        System.arraycopy(b, 0, bi, a.length + 1, b.length)
        out(n + i) = java.lang.Math.floorMod(hashBytes(bi, seed), buckets.toLong).toInt
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "feature_buckets"
  }

  def featureBuckets(tokens: Column, buckets: Int, seed: Long): Column =
    toColumn(FeatureBucketsExpr(exprOf(tokens), buckets, seed))

  private[graft] def wordShingles(text: String, n: Int): Array[String] = {
    val words = text.trim.split("\\s+").filter(_.nonEmpty)
    if (words.length == 0) Array.empty
    else if (words.length <= n) Array(words.mkString(" "))
    else Array.tabulate(words.length - n + 1)(i => words.slice(i, i + n).mkString(" "))
  }

  // ---------------------------------------------------------------------
  // MinHash
  // ---------------------------------------------------------------------

  /** MinHash signature over word `shingleSize`-shingles: element i is
    * min over shingles of splitmix64(shingleHash ^ seed_i). Estimates
    * Jaccard similarity: P[sig_a(i) == sig_b(i)] = J(A, B).
    */
  case class MinHashSignature(child: Expression, numHashes: Int, shingleSize: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val shingles = wordShingles(text, shingleSize)
      val sig = Array.fill(numHashes)(Long.MaxValue)
      var s = 0
      while (s < shingles.length) {
        val base = hashString(shingles(s), 0L)
        var i = 0
        while (i < numHashes) {
          val h = splitmix64(base ^ (i.toLong * 0xc2b2ae3d27d4eb4fL))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
        s += 1
      }
      new GenericArrayData(sig)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "minhash_signature"
  }

  def minhashSignature(c: Column, numHashes: Int = 128, shingleSize: Int = 3): Column =
    toColumn(MinHashSignature(exprOf(c), numHashes, shingleSize))

  /** Estimated Jaccard from two signatures (fraction of agreeing slots) —
    * composed from codegen'd built-ins.
    */
  def minhashJaccard(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x === y).cast("double")),
      lit(0.0), (acc, x) => acc + x) / size(a).cast("double")

  /** LSH band keys for a signature: `bands` hashes, each over a contiguous
    * rows-per-band slice. Two docs sharing any band key are candidates.
    */
  def minhashBands(sig: Column, bands: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(sig, b * (size(sig) / bands) + 1, size(sig) / bands)))

  // ---------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens (Charikar, STOC'02): bit b of
    * the result is the sign of sum over tokens of ±1 on that bit of the
    * token hash.
    */
  case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val counts = new Array[Int](64)
      val toks = text.trim.split("\\s+")
      var t = 0
      while (t < toks.length) {
        if (toks(t).nonEmpty) {
          val h = hashString(toks(t), 0x5bd1e995L)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        t += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
      java.lang.Long.valueOf(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "simhash64"
  }

  def simhash64(c: Column): Column = toColumn(SimHash64(exprOf(c)))

  /** Hamming distance between two 64-bit sketches — pure built-ins
    * (stays in whole-stage codegen).
    */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Chunk keys of a 64-bit SimHash: the sketch split into `nChunks`
    * nearly-equal contiguous bit ranges (the first 64 % nChunks chunks
    * get the extra bit). Pigeonhole: two sketches within Hamming distance
    * nChunks - 1 of each other agree on at least one chunk — so banding
    * with nChunks = maxHamming + 1 gives FULL recall at that radius.
    * Default 4 × 16-bit chunks (radius 3, Manku et al., WWW'07 layout).
    */
  def simhashChunks(sim: Column, nChunks: Int = 4): Column = {
    require(nChunks >= 1 && nChunks <= 64, "nChunks must be in [1,64]")
    val base = 64 / nChunks
    val extra = 64 % nChunks
    val widths = Seq.tabulate(nChunks)(i => if (i < extra) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _)
    array(Seq.tabulate(nChunks) { i =>
      val mask = if (widths(i) == 64) -1L else (1L << widths(i)) - 1L
      shiftrightunsigned(sim, offsets(i)).bitwiseAND(lit(mask))
    }: _*)
  }

  // ---------------------------------------------------------------------
  // Random-hyperplane LSH (embeddings)
  // ---------------------------------------------------------------------

  /** Sign-random-projection sketch (Charikar, STOC'02): bit i = sign of
    * <v, r_i> where r_i is a deterministic pseudo-random ±1 plane derived
    * from (seed, i, dim). Hamming distance between sketches estimates
    * angular distance: P[bit differs] = theta / pi.
    */
  case class HyperplaneSketch(child: Expression, numPlanes: Int, seed: Long)
      extends UnaryExpression with CodegenFallback {
    require(numPlanes >= 1 && numPlanes <= 64, "numPlanes must be in [1,64]")
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val dim = arr.numElements()
      val elemType = child.dataType.asInstanceOf[ArrayType].elementType
      var out = 0L
      var p = 0
      while (p < numPlanes) {
        var dotProd = 0.0
        var i = 0
        while (i < dim) {
          val v = elemType match {
            case FloatType => arr.getFloat(i).toDouble
            case DoubleType => arr.getDouble(i)
            case _ => throw new IllegalArgumentException(s"unsupported element type $elemType")
          }
          // ±1 component from the hash of (seed, plane, dim index)
          val sign = if ((splitmix64(seed ^ (p.toLong << 32) ^ i.toLong) & 1L) == 1L) 1.0 else -1.0
          dotProd += v * sign
          i += 1
        }
        if (dotProd > 0) out |= (1L << p)
        p += 1
      }
      java.lang.Long.valueOf(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "hyperplane_sketch"
  }

  def hyperplaneSketch(vec: Column, numPlanes: Int = 64, seed: Long = 42L): Column =
    toColumn(HyperplaneSketch(exprOf(vec), numPlanes, seed))

  /** Per-plane CONFIDENCE margins of [[HyperplaneSketch]]: |dot(v, h_p)|
    * quantized once to integer micro-units (floor(|dot|·10⁶ + 0.5)) —
    * the bit-flip priority for multi-probe LSH (Lv et al., VLDB 2007):
    * the lower a plane's margin, the likelier its sign bit differs for
    * a true near neighbor, so low-margin bits flip first. Same plane
    * hash and fold order as the sketch, so sketch and margins describe
    * the same hyperplanes on every engine.
    */
  case class HyperplaneMargins(child: Expression, numPlanes: Int, seed: Long)
      extends UnaryExpression with CodegenFallback {
    require(numPlanes >= 1 && numPlanes <= 64, "numPlanes must be in [1,64]")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val dim = arr.numElements()
      val elemType = child.dataType.asInstanceOf[ArrayType].elementType
      val out = new Array[Long](numPlanes)
      var p = 0
      while (p < numPlanes) {
        var dotProd = 0.0
        var i = 0
        while (i < dim) {
          val v = elemType match {
            case FloatType => arr.getFloat(i).toDouble
            case DoubleType => arr.getDouble(i)
            case _ => throw new IllegalArgumentException(s"unsupported element type $elemType")
          }
          val sign = if ((splitmix64(seed ^ (p.toLong << 32) ^ i.toLong) & 1L) == 1L) 1.0 else -1.0
          dotProd += v * sign
          i += 1
        }
        out(p) = math.floor(math.abs(dotProd) * 1e6 + 0.5).toLong
        p += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "hyperplane_margins"
  }

  def hyperplaneMargins(vec: Column, numPlanes: Int = 64, seed: Long = 42L): Column =
    toColumn(HyperplaneMargins(exprOf(vec), numPlanes, seed))

  /** Band keys of a hyperplane sketch: `bands` contiguous chunks of
    * `numPlanes / bands` bits each (8 bands of 8 bits for the default
    * 64-plane sketch). The stride is derived from `numPlanes`, NOT from
    * the 64-bit carrier word: a 32-plane sketch banded 4 ways yields
    * four 8-bit keys over planes [0,8),[8,16),[16,24),[24,32) — so the
    * band that covers plane p is always `p / (numPlanes/bands)`, the
    * same arithmetic multi-probe uses to map margin ranks to flip bits.
    * (Banding at a fixed 64/bands stride would leave high bands
    * constant-zero for numPlanes < 64 — every row colliding — and
    * desynchronize the margin slice from the flipped plane.)
    */
  def sketchBands(sketch: Column, bands: Int = 8, numPlanes: Int = 64): Column = {
    require(numPlanes >= 1 && numPlanes <= 64,
      s"numPlanes must be in [1,64], got $numPlanes")
    require(numPlanes % bands == 0,
      s"numPlanes $numPlanes must split into $bands bands")
    val w = numPlanes / bands
    array((0 until bands).map(i =>
      shiftrightunsigned(sketch, i * w)
        .bitwiseAND(lit(if (w == 64) -1L else (1L << w) - 1))): _*)
  }

  // ---------------------------------------------------------------------
  // Winnowing fingerprints
  // ---------------------------------------------------------------------

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03): rolling hash over character k-grams, keep the min hash of
    * each sliding window of `window` k-grams; distinct selected hashes,
    * sorted. Shared fingerprints ⇒ shared substrings of length ≥ k.
    */
  case class WinnowingFingerprints(child: Expression, k: Int, window: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
        .toLowerCase.replaceAll("\\s+", " ")
      if (text.length < k) return new GenericArrayData(Array.empty[Long])
      val n = text.length - k + 1
      val grams = new Array[Long](n)
      var i = 0
      while (i < n) { grams(i) = hashString(text.substring(i, i + k), 0x27d4eb2fL); i += 1 }
      val selected = scala.collection.mutable.SortedSet.empty[Long]
      var w = 0
      val lastW = math.max(n - window, 0)
      while (w <= lastW) {
        var minH = Long.MaxValue
        var j = w
        val end = math.min(w + window, n)
        while (j < end) { if (grams(j) < minH) minH = grams(j); j += 1 }
        selected += minH
        w += 1
      }
      new GenericArrayData(selected.toArray)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "winnowing_fingerprints"
  }

  def winnowingFingerprints(c: Column, k: Int = 8, window: Int = 4): Column =
    toColumn(WinnowingFingerprints(exprOf(c), k, window))
}
