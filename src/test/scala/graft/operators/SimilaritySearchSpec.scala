package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySearchSpec extends SparkSpec {
  import spark.implicits._

  // 50 deterministic corpus vectors + a planted near-neighbor of vector 0.
  private def vec(seed: Int): Seq[Float] =
    Seq.tabulate(24)(i => math.sin(seed * 31 + i).toFloat)
  private val corpus = ((0 until 50).map(s => (s.toLong, vec(s))) :+
    (99L, vec(0).zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }))
    .toDF("vec_id", "embedding")

  test("brute force knn ranks the planted neighbor first") {
    val q = corpus.filter(col("vec_id") === 0L)
    val got = SimilaritySearch.bruteForceKnn(corpus, q, "embedding", "vec_id", k = 3)
      .orderBy("rnk").collect()
    assert(got.length == 3)
    assert(got(0).getAs[Long]("nid") == 99L)
    assert(got(0).getAs[Double]("sim") > 0.999)
  }

  test("lsh knn recovers the planted neighbor with pruned candidates") {
    val q = corpus.filter(col("vec_id") === 0L)
    val got = SimilaritySearch.lshKnn(corpus, q, "embedding", "vec_id", k = 3,
      bands = 8).orderBy("rnk").collect()
    assert(got.nonEmpty)
    assert(got(0).getAs[Long]("nid") == 99L, s"got ${got.mkString(",")}")
  }

  test("ivf knn recovers the planted neighbor probing a subset of cells") {
    val q = corpus.filter(col("vec_id") === 0L)
    val got = SimilaritySearch.ivfKnn(corpus, q, "embedding", "vec_id", k = 3,
      nCells = 4, nProbe = 2).orderBy("rnk").collect()
    assert(got.nonEmpty)
    assert(got(0).getAs[Long]("nid") == 99L, s"got ${got.mkString(",")}")
  }

  test("brute force and lsh agree on the top hit") {
    val q = corpus.filter(col("vec_id") < 3L)
    val bf = SimilaritySearch.bruteForceKnn(corpus, q, "embedding", "vec_id", 1)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    val lsh = SimilaritySearch.lshKnn(corpus, q, "embedding", "vec_id", 1, bands = 16)
      .select("qid", "nid").as[(Long, Long)].collect().toMap
    // LSH top hit, when present, is a true strong neighbor; query 0's is exact.
    assert(lsh.get(0L).contains(bf(0L)))
  }
}
