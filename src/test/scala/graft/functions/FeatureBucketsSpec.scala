package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** FeatureBucketsExpr vs an independent reference: unigram buckets in
  * token order, then adjacent-bigram buckets, each `floorMod(hashString,
  * buckets)` — the byte-concat bigram in the expression must equal
  * hashing the string `a + " " + b` (what the DuckDB oracle does).
  * Deterministic seeds (house property-spec pattern, `GramCoverageSpec`).
  */
class FeatureBucketsSpec extends SparkSpec {

  private val TheSeed = 0x7a5a0d51e5a3b1c9L

  private def reference(tokens: Seq[String], buckets: Int): Seq[Int] = {
    val uni = tokens.map(t =>
      java.lang.Math.floorMod(Sketches.hashString(t, TheSeed), buckets.toLong).toInt)
    val bi = tokens.iterator.sliding(2).withPartial(false).map(p =>
      java.lang.Math.floorMod(
        Sketches.hashString(p.mkString(" "), TheSeed), buckets.toLong).toInt).toSeq
    uni ++ bi
  }

  private def run(tokens: Seq[String], buckets: Int): Seq[Int] = {
    val expr = Sketches.FeatureBucketsExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        new GenericArrayData(tokens.map(UTF8String.fromString).toArray[Any]),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, containsNull = false)),
      buckets, TheSeed)
    expr.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq
  }

  test("matches the reference on randomized token arrays (incl. unicode, repeats)") {
    val word = Gen.oneOf("a", "bb", "word", "déjà", "自然言語", "x9", "longer-token",
      "MiXeD", "0", "ﬃ")
    val caseGen = for {
      k <- Gen.chooseNum(0, 40)
      ws <- Gen.listOfN(k, word)
      b <- Gen.oneOf(2, 64, 1024, 65536)
    } yield (ws, b)
    val cases = (0 until 300).flatMap { i =>
      caseGen(Gen.Parameters.default, Seed(i.toLong))
    }
    cases.foreach { case (ws, b) =>
      assert(run(ws, b) == reference(ws, b), s"mismatch for buckets=$b tokens=$ws")
    }
  }

  test("degenerate cases: empty array, single token") {
    assert(run(Nil, 64) == Nil)
    val one = run(Seq("solo"), 64)
    assert(one.length == 1 &&
      one.head == java.lang.Math.floorMod(Sketches.hashString("solo", TheSeed), 64L).toInt)
  }
}
