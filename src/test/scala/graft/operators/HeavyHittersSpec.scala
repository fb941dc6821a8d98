package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted heavy-hitter synopsis: enumeration from kv rows alone,
  * the SpaceSaving-union containment guarantee, and CMS's
  * never-undercount carried through the rollup.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // three "sources" with shared global heavy terms and per-source tails —
  // a tight width (16) forces real collisions so over-counting is
  // exercised, not just the exact regime
  private val terms = (
    Seq.fill(90)(("a", "alpha")) ++ Seq.fill(70)(("a", "beta")) ++
      Seq.fill(80)(("b", "alpha")) ++ Seq.fill(50)(("b", "gamma")) ++
      Seq.fill(60)(("c", "alpha")) ++ Seq.fill(40)(("c", "beta")) ++
      (1 to 200).map(i => (Seq("a", "b", "c")(i % 3), s"tail$i")))
    .toDF("src", "term")

  private def synopsis(nCands: Int, depth: Int = 4, width: Int = 16): String = {
    val path = java.nio.file.Files.createTempDirectory("hhsyn").toString
    CorpusStats.buildTermSynopsis(terms, "src", "term", path,
      nCandidates = nCands, depth = depth, width = width)
    path
  }

  test("global heavy hitters enumerate from the synopsis; estimates never undercount") {
    val path = synopsis(nCands = 8)
    val hh = CorpusStats.heavyHitters(spark, path, k = 5, depth = 4, width = 16)
      .collect().sortBy(_.getAs[Int]("rnk"))
    // the three global heavies lead, in exact-count order
    assert(hh.take(3).map(_.getAs[String]("term")).toSeq ==
      Seq("alpha", "beta", "gamma"))
    val exact = terms.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    hh.foreach { r =>
      assert(r.getAs[Long]("cms_n") >= exact(r.getAs[String]("term")),
        s"undercount for ${r.getAs[String]("term")}: $r")
    }
    // alpha's estimate is exactly right OR inflated by collisions — but
    // its rank survives them (230 vs 120/50: the margin CMS is for)
    assert(hh.head.getAs[String]("term") == "alpha")
  }

  test("containment bound: a term above the sum of nth-candidate counts is always enumerable") {
    // nCands=2: each source's candidate table holds its top-2 terms.
    // alpha is every source's #1, so it is in the union REGARDLESS of
    // the tail — the SpaceSaving-union guarantee in its tightest case.
    val path = synopsis(nCands = 2)
    val cands = spark.read.format("kv").option("path", s"$path/cands").load()
    assert(cands.filter(col("term") === "alpha").count() == 3)
    assert(cands.count() == 6) // exactly nCands per source — bounded state
    val hh = CorpusStats.heavyHitters(spark, path, k = 3, depth = 4, width = 16)
    assert(hh.filter(col("term") === "alpha" && col("rnk") === 1).count() == 1)
  }

  test("candidate tables are exact per-source top-n with (n desc, term asc) ties") {
    val path = synopsis(nCands = 3)
    val got = spark.read.format("kv").option("path", s"$path/cands").load()
      .filter(col("grp") === "a").orderBy(col("n").desc, col("term"))
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("n"))).toSeq
    // source a: alpha 90, beta 70, then the 67 tail terms at 1 — tie on
    // term asc picks the lexicographically smallest tail
    assert(got.take(2) == Seq(("alpha", 90L), ("beta", 70L)))
    assert(got(2)._2 == 1L)
  }
}
