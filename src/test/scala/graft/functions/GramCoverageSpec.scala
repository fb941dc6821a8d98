package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** GramCoverage vs an independent reference: group the n-grams, then
  * top = max count×len, dup = Σ count×len over count ≥ 2 — the same
  * math the retired sort+fold formulation and the DuckDB oracle use.
  * Deterministic seeds keep runs reproducible (house property-spec
  * pattern, `KvFiltersPropertySpec`).
  */
class GramCoverageSpec extends SparkSpec {
  import spark.implicits._

  private def reference(words: Seq[String], n: Int): (Long, Long) = {
    if (words.length < n) return (0L, 0L)
    val grams = words.sliding(n).map(_.mkString(" ")).toSeq
    val counts = grams.groupBy(identity).view.mapValues(_.length.toLong)
    val covered = counts.map { case (g, c) => (c, g.codePointCount(0, g.length).toLong) }
    val top = covered.map { case (c, l) => c * l }.maxOption.getOrElse(0L)
    val dup = covered.collect { case (c, l) if c >= 2 => c * l }.sum
    (top, dup)
  }

  private def run(words: Seq[String], n: Int): (Long, Long) = {
    val r = Seq(words).toDF("ws")
      .select(GramCoverage.gramCoverage(col("ws"), n).as("c"))
      .select(col("c.top"), col("c.dup")).head()
    (r.getLong(0), r.getLong(1))
  }

  test("matches the reference on randomized word arrays (incl. repeats, unicode)") {
    val word = Gen.oneOf("a", "bb", "ccc", "déjà", "x", "yy", "自然")
    val caseGen = for {
      k <- Gen.chooseNum(0, 30)
      ws <- Gen.listOfN(k, word)
      n <- Gen.chooseNum(1, 5)
    } yield (ws, n)
    val cases = (0 until 200).flatMap { i =>
      caseGen(Gen.Parameters.default, Seed(i.toLong))
    }
    // direct evaluation (fast path); the Spark/codegen path is pinned by
    // the degenerate test below and the q_doc_repetition gate
    cases.foreach { case (ws, n) =>
      val row = GramCoverage.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          ws.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any]), n)
      assert((row.getLong(0), row.getLong(1)) == reference(ws, n),
        s"mismatch for n=$n words=$ws")
    }
  }

  test("degenerate cases: empty, shorter than n, single repeated gram") {
    assert(run(Nil, 2) == (0L, 0L))
    assert(run(Seq("only"), 2) == (0L, 0L))
    // "a a a" bigrams: "a a" ×2 → top = 2*3 = 6, dup = 6
    assert(run(Seq("a", "a", "a"), 2) == (6L, 6L))
  }
}
