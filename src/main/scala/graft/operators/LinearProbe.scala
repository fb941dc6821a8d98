package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed linear-probe training — the "train a quality/topic
  * classifier" step of curation pipelines (FineWeb/CCNet-style quality
  * filtering, domain probes over cheap features), as ridge-regularized
  * least squares with an EXACTLY replayable derivation:
  *
  *   1. ONE distributed pass computes the Gram moments — per row the
  *      dim² feature products f_i·f_j (and f_i·y), each quantized ONCE
  *      to integer micro units (floor(x·10⁶ + 0.5)), summed exactly
  *      (Decimal(38,0), the [[SimilaritySearch.powerDirection]]
  *      overflow discipline: wraps are loud errors, never divergence).
  *   2. Moments NORMALIZE to means by truncating integer division by
  *      the row count — entries stay O(10⁶ · feature²) no matter the
  *      corpus size, so the solve's intermediates are scale-invariant
  *      (the 100 TB contract: a billion rows changes n, not magnitudes).
  *   3. The driver solves (M + λI)·w = b by CRAMER'S RULE in exact
  *      BigInt arithmetic (dim ≤ 4: 24-term cofactor expansions), and
  *      quantizes each weight once: w_j = (10⁶·det_j) ÷ det with
  *      sign-aware truncating division — M is a Gram matrix (PSD), so
  *      det(M + λI) > 0 for λ ≥ 1 and the solve never needs pivoting.
  *
  * Every step is closed-form integer arithmetic over the data, so the
  * oracle replays the WHOLE derivation in SQL — quantized products,
  * exact sums, truncating mean, the literal cofactor expansion in
  * HUGEINT, and the final quantized division. No float solver, no
  * iteration count to tune, nothing engine-specific.
  *
  * Scale shape: one partial-aggregable pass (dim·(dim+3)/2 + 1 sum
  * columns — no explode, no shuffle beyond the single aggregate);
  * driver state is dim² longs. Reference analogue: the
  * `logistic_regression` scorer ships COEFFICIENTS in
  * (`MlFunctions.scala`) — this is the training side the reference
  * leaves to offline tools, kept distributed and oracle-replayable.
  */
object LinearProbe {

  private val MICRO = 1000000L

  /** Exact integer mean-moments of (features, label): returns
    * (M, b, n) where M_ij = (Σ floor(f_i·f_j·10⁶+0.5)) ÷ n and
    * b_i = (Σ floor(f_i·y·10⁶+0.5)) ÷ n (truncating division — all
    * inputs non-negative by the `require` below, so floor = truncate
    * on both engines).
    */
  def momentsMicro(df: DataFrame, featCol: String, labelCol: String,
      dim: Int): (Array[Array[Long]], Array[Long], Long) = {
    require(dim >= 1 && dim <= 4,
      s"dim must be in [1, 4] (Cramer cofactor solve), got $dim")
    val dec = DecimalType(38, 0)
    def q(c: Column): Column =
      floor(c * lit(MICRO.toDouble) + lit(0.5)).cast(dec)
    val f = (0 until dim).map(i => element_at(col(featCol), i + 1))
    val y = col(labelCol).cast("double")
    // upper triangle + b + n in ONE aggregate pass
    val aggs =
      (for (i <- 0 until dim; j <- i until dim)
        yield sum(q(f(i) * f(j))).as(s"m_${i}_$j")) ++
      (0 until dim).map(i => sum(q(f(i) * y)).as(s"b_$i")) :+
      count(lit(1)).as("n")
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = r.getAs[Long]("n")
    require(n > 0, "empty corpus has no probe")
    def cell(name: String): Long = {
      val bd = BigDecimal(r.getAs[java.math.BigDecimal](name))
      require(bd >= 0,
        s"moment $name is negative — features and label must be " +
          "non-negative (truncating mean ≠ floor mean otherwise)")
      val v = (bd.toBigInt / BigInt(n)).toLong
      // HUGEINT-safety, derived not hoped: |det| ≤ dim!·maxEntry^dim
      // (cofactor bound), and the final numerator multiplies by 10⁶ —
      // entries ≤ 4·10⁷ keep 10⁶·24·(4·10⁷)⁴ ≈ 6·10³⁷ < 2^127 ≈
      // 1.7·10³⁸. Pre-scale features to O(1) (mean products ≤ 40).
      require(v <= 40000000L,
        s"normalized moment $name = $v exceeds 4e7 — pre-scale the " +
          "features (the Cramer determinants would leave the oracle's " +
          "128-bit integer range)")
      v
    }
    val m = Array.tabulate(dim, dim)((i, j) =>
      if (i <= j) cell(s"m_${i}_$j") else cell(s"m_${j}_$i"))
    val b = Array.tabulate(dim)(i => cell(s"b_$i"))
    (m, b, n)
  }

  /** Exact determinant by cofactor expansion (BigInt, dim ≤ 4). */
  private[operators] def det(m: Array[Array[BigInt]]): BigInt = m.length match {
    case 1 => m(0)(0)
    case d =>
      (0 until d).map { j =>
        val minor = m.tail.map(row =>
          row.zipWithIndex.collect { case (x, c) if c != j => x })
        val s = if (j % 2 == 0) BigInt(1) else BigInt(-1)
        s * m(0)(j) * det(minor)
      }.sum
  }

  /** Train the ridge probe: integer micro-unit weights w (length dim)
    * with w·f/10⁶ the predicted label. `lambdaMicro` is the ridge
    * term in the same micro units as the moments (≥ 1 keeps M + λI
    * positive definite even on degenerate corpora).
    */
  def trainRidge(df: DataFrame, featCol: String, labelCol: String,
      dim: Int, lambdaMicro: Long = MICRO): Seq[Long] = {
    require(lambdaMicro >= 1, s"lambdaMicro must be >= 1, got $lambdaMicro")
    val (m, b, _) = momentsMicro(df, featCol, labelCol, dim)
    val a = Array.tabulate(dim, dim)((i, j) =>
      BigInt(m(i)(j)) + (if (i == j) BigInt(lambdaMicro) else BigInt(0)))
    val d = det(a)
    require(d > 0, s"det(M + λI) must be positive, got $d")
    (0 until dim).map { j =>
      val aj = Array.tabulate(dim, dim)((r, c) =>
        if (c == j) BigInt(b(r)) else a(r)(c))
      val dj = det(aj)
      val num = BigInt(MICRO) * dj
      (num / d).toLong // BigInt / truncates toward zero — sign-safe
    }
  }

  /** Score a feature array with trained micro-unit weights: the
    * predicted label as a double — row-local, codegen-friendly
    * built-ins only.
    */
  def score(feat: Column, w: Seq[Long]): Column = {
    val terms = w.zipWithIndex.map { case (wj, i) =>
      element_at(feat, i + 1) * lit(wj.toDouble / MICRO.toDouble)
    }
    terms.reduce(_ + _)
  }
}
