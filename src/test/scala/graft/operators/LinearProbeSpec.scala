package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinearProbeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent plain-Scala replay of the whole derivation: quantized
    * products, exact sums, truncating mean, ridge diagonal, Cramer in
    * BigInt, quantized division.
    */
  private def referenceRidge(rows: Seq[(Seq[Double], Double)],
      dim: Int, lambdaMicro: Long): Seq[Long] = {
    def q(x: Double): BigInt = BigInt(math.floor(x * 1e6 + 0.5).toLong)
    val n = BigInt(rows.length)
    def mean(vals: Seq[BigInt]): BigInt = vals.sum / n
    val m = Array.tabulate(dim, dim)((i, j) =>
      mean(rows.map { case (f, _) => q(f(i) * f(j)) }))
    val b = Array.tabulate(dim)(i =>
      mean(rows.map { case (f, y) => q(f(i) * y) }))
    val a = Array.tabulate(dim, dim)((i, j) =>
      m(i)(j) + (if (i == j) BigInt(lambdaMicro) else BigInt(0)))
    def det(x: Array[Array[BigInt]]): BigInt =
      if (x.length == 1) x(0)(0)
      else (0 until x.length).map { j =>
        val minor = x.tail.map(r =>
          r.zipWithIndex.collect { case (v, c) if c != j => v })
        (if (j % 2 == 0) BigInt(1) else BigInt(-1)) * x(0)(j) * det(minor)
      }.sum
    val d = det(a)
    (0 until dim).map { j =>
      val aj = Array.tabulate(dim, dim)((r, c) =>
        if (c == j) b(r) else a(r)(c))
      ((BigInt(1000000) * det(aj)) / d).toLong
    }
  }

  private def frame(rows: Seq[(Seq[Double], Double)]) =
    rows.zipWithIndex.map { case ((f, y), i) => (i.toLong, f, y) }
      .toDF("id", "f", "y")

  test("trainRidge matches the plain-Scala exact replay") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val rows = Seq.fill(120)((
        Seq(1.0, rnd.nextInt(200) / 100.0, rnd.nextInt(40) / 10.0,
          rnd.nextInt(80) / 10.0),
        if (rnd.nextBoolean()) 1.0 else 0.0))
      val got = LinearProbe.trainRidge(frame(rows), "f", "y", dim = 4)
      val want = referenceRidge(rows, 4, 1000000L)
      assert(got == want, s"trial $trial: got=$got want=$want")
    }
  }

  test("the probe learns a planted linear signal and beats the mean predictor") {
    // y is EXACTLY 0.5·f1 (plus nothing): the solve must put its weight
    // on slot 1 and predict far better than the label mean
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200) {
      val f1 = rnd.nextInt(100) / 50.0
      (Seq(1.0, f1, rnd.nextInt(40) / 20.0, 0.0), 0.5 * f1)
    }
    // light ridge: with O(1) moments the default λ = 1.0 (10⁶ micro)
    // shrinks hard by design; recovery of the planted coefficient
    // needs λ ≪ the Gram entries
    val w = LinearProbe.trainRidge(frame(rows), "f", "y", dim = 4,
      lambdaMicro = 1000L)
    assert(math.abs(w(1) - 500000L) < 50000L, s"slot-1 weight off: $w")
    val scored = frame(rows).select(col("y"),
      LinearProbe.score(col("f"), w).as("p"))
    val meanY = rows.map(_._2).sum / rows.length
    val mse = scored.select(
      avg(pow(col("y") - col("p"), 2)).as("probe"),
      avg(pow(col("y") - lit(meanY), 2)).as("base")).collect()(0)
    assert(mse.getAs[Double]("probe") < mse.getAs[Double]("base") / 4,
      s"probe MSE ${mse.getAs[Double]("probe")} vs base ${mse.getAs[Double]("base")}")
  }

  test("determinism and guards") {
    val rows = Seq.fill(50)((Seq(1.0, 2.0, 0.5, 1.5), 1.0))
    def run() = LinearProbe.trainRidge(frame(rows), "f", "y", dim = 4)
    assert(run() == run())
    // dim out of Cramer range
    intercept[IllegalArgumentException] {
      LinearProbe.trainRidge(frame(rows), "f", "y", dim = 5)
    }
    // un-scaled features trip the HUGEINT-safety moment guard loudly
    intercept[IllegalArgumentException] {
      LinearProbe.trainRidge(
        frame(Seq.fill(50)((Seq(1.0, 9000.0, 0.5, 1.5), 1.0))),
        "f", "y", dim = 4)
    }
    // negative moments (floor-mean vs truncate-mean divergence) refuse
    intercept[IllegalArgumentException] {
      LinearProbe.trainRidge(
        frame(Seq.fill(50)((Seq(1.0, -2.0, 0.5, 1.5), 1.0))),
        "f", "y", dim = 4)
    }
    // lambda keeps the degenerate all-identical corpus solvable
    assert(LinearProbe.trainRidge(frame(rows), "f", "y", dim = 4,
      lambdaMicro = 1L).length == 4)
  }
}
