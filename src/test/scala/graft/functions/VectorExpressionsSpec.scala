package graft.functions

import graft.SparkSpec
import graft.functions.VectorExpressions.{arrayDot, l2Norm}
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("array_dot matches the higher-order-function formulation bit-for-bit") {
    val df = (0 until 100).map { i =>
      (Seq.tabulate(32)(j => math.sin(i * 31 + j).toFloat),
        Seq.tabulate(32)(j => math.cos(i * 17 + j).toFloat))
    }.toDF("a", "b")
    val got = df.select(arrayDot(col("a"), col("b")).as("d")).as[Double].collect()
    val ref = df.select(
      aggregate(zip_with(transform(col("a"), x => x.cast("double")),
        transform(col("b"), x => x.cast("double")), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d")).as[Double].collect()
    got.zip(ref).foreach { case (g, r) => assert(g == r, s"$g != $r") }
  }

  test("array_dot works on float and double arrays, nulls propagate") {
    val f = Seq((Seq(1.0f, 2.0f), Seq(3.0, 4.0))).toDF("a", "b")
    assert(f.select(arrayDot(col("a"), col("b"))).as[Double].head() == 11.0)
    assert(f.select(l2Norm(col("a"))).as[Double].head() == math.sqrt(5.0))
    val n = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]])).toDF("a", "b")
    assert(n.select(arrayDot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("array_dot participates in whole-stage codegen") {
    // non-foldable input (range) so the projection isn't constant-folded
    val df = spark.range(100).select(
      transform(sequence(lit(0), lit(7)), i => (col("id") + i).cast("double")).as("a"))
      .select(arrayDot(col("a"), col("a")).as("d"))
    // `*(n)` marks a WholeStageCodegen stage in the plan string
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[array_dot""".r.findFirstIn(plan).isDefined, plan)
    assert(df.agg(sum("d")).as[Double].head() > 0)
  }

  test("binary_asym_score: exact integer contract, codegen participates") {
    import graft.functions.VectorExpressions.binaryAsymScore
    // dim=40 exercises the partial second word
    val dim = 40
    def signs(seed: Int): Seq[Double] =
      Seq.tabulate(dim)(i => math.sin(seed * 37 + i + 1))
    def packed(v: Seq[Double]): Seq[Long] =
      Seq.tabulate((dim + 31) / 32) { w =>
        (0 until math.min(32, dim - w * 32)).map { b =>
          if (v(w * 32 + b) > 0.0) 1L << b else 0L
        }.sum
      }
    val qq = Seq.tabulate(dim)(i => ((i * 13) % 255 - 127).toLong)
    val rows = (1 to 20).map(s => (qq, packed(signs(s)), signs(s)))
    val df = rows.toDF("qq", "bw", "v")
    val got = df.select(binaryAsymScore(col("qq"), col("bw"), dim).as("s"))
      .as[Long].collect()
    val ref = rows.map { case (q, _, v) =>
      q.zip(v).map { case (qi, vi) => if (vi > 0.0) qi else -qi }.sum
    }
    got.zip(ref).foreach { case (g, r) => assert(g == r, s"$g != $r") }
    // inside whole-stage codegen (non-foldable input)
    // double-reference the HOF outputs so CollapseProject keeps them in
    // their own projection (lambda HOFs are CodegenFallback and would
    // drag the whole collapsed Project out of WSCG — the array_dot
    // test's trick)
    val cg = spark.range(50).select(
      transform(sequence(lit(0), lit(dim - 1)),
        i => (col("id") % 7 - 3).cast("long")).as("qq"),
      transform(sequence(lit(0), lit((dim + 31) / 32 - 1)),
        w => (col("id") * 2654435761L).bitwiseAND(lit(0xffffffffL))).as("bw"))
      .select(binaryAsymScore(col("qq"), col("bw"), dim).as("s"),
        size(col("qq")).as("nq"), size(col("bw")).as("nw"))
    val plan = cg.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[binary_asym_score""".r.findFirstIn(plan).isDefined,
      plan)
    assert(cg.count() == 50)
    // too-short inputs fail loud, not silently truncate
    intercept[Exception] {
      Seq((Seq(1L, 2L), Seq(1L))).toDF("qq", "bw")
        .select(binaryAsymScore(col("qq"), col("bw"), 40)).collect()
    }
  }
}
