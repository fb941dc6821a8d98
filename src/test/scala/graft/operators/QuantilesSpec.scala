package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("binnedQuantiles interpolates between straddling order statistics") {
    val df = Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0, "a" -> 4.0, "a" -> 5.0,
      "b" -> 10.0, "b" -> 20.0, "b" -> 30.0, "b" -> 40.0)
      .toDF("g", "v")
    val out = CorpusStats.binnedQuantiles(df, "g", "v", Seq(0.25, 0.5, 0.9))
      .orderBy("g").collect()

    val a = out(0) // n=5: pos(0.5)=2 → 3.0 exactly; pos(0.25)=1 → 2.0; pos(0.9)=3.6 → 4.6
    assert(a.getAs[Long]("n") == 5)
    assert(a.getAs[Double]("q_5") == 3.0)
    assert(a.getAs[Double]("q_25") == 2.0)
    assert(math.abs(a.getAs[Double]("q_9") - 4.6) < 1e-9)

    val b = out(1) // n=4: pos(0.5)=1.5 → 25.0 (midpoint)
    assert(b.getAs[Double]("q_5") == 25.0)
  }

  test("duplicate values collapse into one bin with the right rank span") {
    // 1,1,1,9 — p=0.5 → pos=1.5, both straddlers are 1.0 → q=1.0
    val df = Seq.fill(3)("g" -> 1.0).toDF("g", "v")
      .unionByName(Seq("g" -> 9.0).toDF("g", "v"))
    val out = CorpusStats.binnedQuantiles(df, "g", "v", Seq(0.5, 1.0)).collect()(0)
    assert(out.getAs[Double]("q_5") == 1.0)
    assert(out.getAs[Double]("q_1") == 9.0) // p=1 → the max
  }

  test("single-row group returns its value at every p") {
    val out = CorpusStats.binnedQuantiles(
      Seq("x" -> 7.25).toDF("g", "v"), "g", "v", Seq(0.0, 0.5, 1.0)).collect()(0)
    assert(out.getAs[Double]("q_0") == 7.25)
    assert(out.getAs[Double]("q_5") == 7.25)
    assert(out.getAs[Double]("q_1") == 7.25)
  }

  test("binning quantizes sub-bin noise") {
    val df = Seq("g" -> 1.001, "g" -> 1.0009, "g" -> 2.0).toDF("g", "v")
    val out = CorpusStats.binnedQuantiles(df, "g", "v", Seq(0.5), binDecimals = 2)
      .collect()(0)
    assert(out.getAs[Double]("q_5") == 1.0) // both 1.00x rows share bin 1.00
  }
}
