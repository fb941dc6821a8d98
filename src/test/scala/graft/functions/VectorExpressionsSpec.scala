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
}
