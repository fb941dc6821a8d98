package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Attribute-filtered ANN: the pre-filter exact baseline, the in-cell
  * predicate pushdown, and the post-filter oversampling strategy — the
  * invariants that make the q_ann_filtered* gates trustworthy.
  */
class FilteredSearchSpec extends SparkSpec {
  import spark.implicits._

  // 60 deterministic vectors over 3 label strata, plus a planted same-label
  // near-twin of vector 0 (label 0) and a planted OTHER-label near-twin —
  // the filter must return the former and never the latter.
  private def vec(seed: Int): Seq[Float] =
    Seq.tabulate(24)(i => math.sin(seed * 31 + i).toFloat)
  private def twin(of: Int): Seq[Float] =
    vec(of).zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
  private val corpus = (
    (0 until 60).map(s => (s.toLong, vec(s), s % 3)) :+
      ((99L, twin(0), 0)) :+ ((98L, twin(0), 1)))
    .toDF("vec_id", "embedding", "label")

  test("filteredKnn: stratum-exact — same-label twin first, cross-label twin never") {
    val q = corpus.filter(col("vec_id") === 0L)
    val got = SimilaritySearch.filteredKnn(corpus, q,
      "embedding", "vec_id", "label", k = 5).orderBy("rnk").collect()
    assert(got.length == 5)
    assert(got(0).getAs[Long]("nid") == 99L)
    assert(!got.exists(_.getAs[Long]("nid") == 98L))
    // equals brute force over the pre-filtered stratum, row for row
    val stratum = SimilaritySearch.bruteForceKnn(
      corpus.filter(col("label") === 0), q, "embedding", "vec_id", k = 5)
      .orderBy("rnk").collect().map(_.toString).toSeq
    assert(got.map(_.toString).toSeq == stratum)
  }

  test("ivfFilteredKnn: constraint holds; probing every cell recovers the exact result") {
    val q = corpus.filter(col("vec_id") < 3L)
    val labels = corpus.select(col("vec_id").as("nid"),
      col("label").cast("long").as("nlbl"))
    val qLabels = corpus.select(col("vec_id").as("qid"),
      col("label").cast("long").as("qlbl"))
    val got = SimilaritySearch.ivfFilteredKnn(corpus, q,
      "embedding", "vec_id", "label", k = 4, nCells = 4, nProbe = 2)
    // every returned neighbor shares its query's label
    assert(got.join(labels, "nid").join(qLabels, "qid")
      .filter(col("nlbl") =!= col("qlbl")).count() == 0)
    // nProbe = nCells scans the whole (partitioned) corpus — exact
    val all = SimilaritySearch.ivfFilteredKnn(corpus, q,
      "embedding", "vec_id", "label", k = 4, nCells = 4, nProbe = 4)
      .orderBy("qid", "rnk").collect().map(_.toString).toSeq
    val exact = SimilaritySearch.filteredKnn(corpus, q,
      "embedding", "vec_id", "label", k = 4)
      .orderBy("qid", "rnk").collect().map(_.toString).toSeq
    assert(all == exact)
  }

  test("post-filter: predicate holds, saturating oversample converges to in-cell") {
    val q = corpus.filter(col("vec_id") < 3L)
    val labels = corpus.select(col("vec_id").as("nid"),
      col("label").cast("long").as("nlbl"))
    val qLabels = corpus.select(col("vec_id").as("qid"),
      col("label").cast("long").as("qlbl"))
    val post = SimilaritySearch.ivfPostFilterKnn(corpus, q,
      "embedding", "vec_id", "label", k = 4, oversample = 2,
      nCells = 4, nProbe = 2)
    assert(post.join(labels, "nid").join(qLabels, "qid")
      .filter(col("nlbl") =!= col("qlbl")).count() == 0)
    // oversample ≥ probed-cell population ⇒ the shortlist IS the probed
    // candidate set ⇒ post-filter ≡ in-cell pushdown, bit for bit
    val saturated = SimilaritySearch.ivfPostFilterKnn(corpus, q,
      "embedding", "vec_id", "label", k = 4, oversample = 64,
      nCells = 4, nProbe = 2).orderBy("qid", "rnk")
      .collect().map(_.toString).toSeq
    val incell = SimilaritySearch.ivfFilteredKnn(corpus, q,
      "embedding", "vec_id", "label", k = 4, nCells = 4, nProbe = 2)
      .orderBy("qid", "rnk").collect().map(_.toString).toSeq
    assert(saturated == incell)
  }

  test("persisted filtered index: indexed ≡ in-memory; append is batching-independent") {
    val q = corpus.filter(col("vec_id") < 3L)
    val base = corpus.filter(col("vec_id") < 40L || col("vec_id") >= 90L)
    val extra = corpus.filter(col("vec_id") >= 40L && col("vec_id") < 60L)
    def search(path: String) =
      SimilaritySearch.ivfFilteredKnnIndexed(q,
        "embedding", "vec_id", "label", path, k = 4, nProbe = 4)
        .orderBy("qid", "rnk").collect().map(_.toString).toSeq

    // full build ≡ the in-memory operator, bit for bit
    val full = java.nio.file.Files.createTempDirectory("fvidx_full").toString
    SimilaritySearch.buildFilteredIvfIndex(corpus, "embedding", "vec_id",
      "label", full, nCells = 4)
    assert(search(full) ==
      SimilaritySearch.ivfFilteredKnn(corpus, q, "embedding", "vec_id",
        "label", k = 4, nCells = 4, nProbe = 4)
        .orderBy("qid", "rnk").collect().map(_.toString).toSeq)

    // append in one call vs two chops: the searched result is identical
    // (assignment against FIXED stored centroids is row-local)
    val one = java.nio.file.Files.createTempDirectory("fvidx_one").toString
    SimilaritySearch.buildFilteredIvfIndex(base, "embedding", "vec_id",
      "label", one, nCells = 4)
    SimilaritySearch.filteredIndexAppend(extra, "embedding", "vec_id", "label", one)
    val two = java.nio.file.Files.createTempDirectory("fvidx_two").toString
    SimilaritySearch.buildFilteredIvfIndex(base, "embedding", "vec_id",
      "label", two, nCells = 4)
    SimilaritySearch.filteredIndexAppend(
      extra.filter(col("vec_id") < 50L), "embedding", "vec_id", "label", two)
    SimilaritySearch.filteredIndexAppend(
      extra.filter(col("vec_id") >= 50L), "embedding", "vec_id", "label", two)
    assert(search(one) == search(two))

    // a crash-retried append (same batch twice) changes nothing: the
    // (qid, nid) dedup keeps one heap seat per neighbor
    SimilaritySearch.filteredIndexAppend(extra, "embedding", "vec_id", "label", one)
    assert(search(one) == search(two))
  }

  test("audit: recall_milli bounded by 1000; post recall monotone in oversample") {
    val q = corpus.filter(col("vec_id") < 3L)
    val rows = SimilaritySearch.filteredRecallAudit(corpus, q,
      "embedding", "vec_id", "label", k = 3, oversamples = Seq(1, 4, 16),
      nCells = 4, nProbe = 2).collect()
      .map(r => r.getAs[String]("strategy") -> r.getAs[Long]("recall_milli"))
      .toMap
    assert(rows.keySet == Set("incell", "post_ov01", "post_ov04", "post_ov16"))
    assert(rows.values.forall(v => v >= 0 && v <= 1000))
    // a larger shortlist only APPENDS worse-sim survivors: the filtered
    // prefix is preserved, so recall against the exact truth never drops
    assert(rows("post_ov04") >= rows("post_ov01"))
    assert(rows("post_ov16") >= rows("post_ov04"))
  }
}
