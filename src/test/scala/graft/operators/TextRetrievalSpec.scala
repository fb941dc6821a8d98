package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark runs fast queries fast"),
    (2L, "duck runs slow"),
    (3L, "spark spark spark spark spark spark spark spark"), // tf saturation
    (4L, "a very long document about nothing in particular with many words " +
      "padding padding padding padding padding padding spark"),
    (5L, "unrelated text entirely")
  ).toDF("doc_id", "text")

  private def run(qs: Seq[(Int, String)], k: Int = 5) =
    TextRetrieval.bm25TopK(docs, qs.toDF("qid", "qtext"),
      "text", "doc_id", "qid", "qtext", k)

  /** Plain-Scala BM25 replay with the operator's exact quantization. */
  private def reference(query: String, k1: Double = 1.2, b: Double = 0.75): Map[Long, Long] = {
    val corpus = docs.as[(Long, String)].collect().toMap
      .view.mapValues(_.toLowerCase.split(" ", -1).toSeq).toMap
    val nd = corpus.size.toDouble
    val avgdl = corpus.values.map(_.size.toDouble).sum / nd
    val qterms = query.toLowerCase.split(" ", -1).distinct.toSeq
    corpus.flatMap { case (id, terms) =>
      val dl = terms.size.toDouble
      val cs = qterms.flatMap { t =>
        val tf = terms.count(_ == t).toDouble
        if (tf == 0) None
        else {
          val dfq = corpus.values.count(_.contains(t)).toDouble
          val idf = math.log(1.0 + (nd - dfq + 0.5) / (dfq + 0.5))
          val tfp = tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
          Some(math.floor(idf * tfp * 1e6 + 0.5).toLong)
        }
      }
      if (cs.isEmpty) None else Some(id -> cs.sum)
    }
  }

  test("bm25 matches an independent scalar replay exactly") {
    val got = run(Seq((1, "spark fast"), (2, "runs"))).collect()
      .map(r => (r.getAs[Int]("qid"), r.getAs[Long]("doc_id")) -> r.getAs[Long]("score_micro"))
      .toMap
    val want1 = reference("spark fast")
    val want2 = reference("runs")
    assert(got.collect { case ((1, d), s) => d -> s } == want1)
    assert(got.collect { case ((2, d), s) => d -> s } == want2)
  }

  test("bm25 ranking behaves: tf saturates, length normalizes, rarity weighs") {
    val top = run(Seq((1, "spark"))).filter($"rnk" === 1)
      .select("doc_id").as[Long].head()
    // doc 3 is all-spark: highest tf, short — must win the 'spark' query
    assert(top == 3L)
    // a doc without any query term never appears
    val ids = run(Seq((1, "spark"))).select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(5L) && !ids.contains(2L))
    // rare term ('duck', df=1) outweighs common ('spark', df=3) for the
    // doc containing it
    val mixed = run(Seq((1, "duck spark"))).orderBy($"rnk").collect()
    assert(mixed.head.getAs[Long]("doc_id") == 2L,
      mixed.map(_.toString).mkString(","))
  }

  test("persisted index answers identically to the in-memory path") {
    val idx = java.nio.file.Files.createTempDirectory("bm25idx").toString + "/i"
    TextRetrieval.buildBm25Index(docs, "text", "doc_id", idx, numBuckets = 4)
    val qs = Seq((1, "spark fast"), (2, "runs duck")).toDF("qid", "qtext")
    val mem = TextRetrieval.bm25TopK(docs, qs, "text", "doc_id", "qid", "qtext", k = 5)
      .collect().map(_.toString).sorted.toSeq
    val viaIdx = TextRetrieval.bm25TopKIndexed(spark, idx, qs, "qid", "qtext", k = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(mem == viaIdx)
  }

  test("rrfFuse combines rankings exactly (integer contributions, both-lists boost)") {
    val a = Seq((1, 100L, 1), (1, 101L, 2), (1, 102L, 3)).toDF("qid", "doc_id", "rnk")
    val b = Seq((1, 102L, 1), (1, 103L, 2)).toDF("qid", "doc_id", "rnk")
    val got = TextRetrieval.rrfFuse(Seq(a, b), k = 4)
      .orderBy("rnk").as[(Int, Long, Long, Int)].collect().toSeq
    def c(r: Int) = 1000000L / (60 + r)
    // doc 102 appears in both lists → top despite rank 3 in list a
    val want = Seq(
      (1, 102L, c(3) + c(1), 1),
      (1, 100L, c(1), 2),
      (1, 101L, c(2), 3), // ties (16129) break doc_id-asc
      (1, 103L, c(2), 4))
    assert(got == want, s"got=$got want=$want")
  }

  test("bm25IndexAppend absorbs new docs; search equals a full rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("bm25app").toString + "/idx"
    val first = docs.filter(col("doc_id") <= 3L)
    val extra = docs.filter(col("doc_id") > 3L)
    TextRetrieval.buildBm25Index(first, "text", "doc_id", dir)
    TextRetrieval.bm25IndexAppend(extra, "text", "doc_id", dir)
    val qs = Seq((1, "spark fast runs"), (2, "padding text")).toDF("qid", "qtext")
    val appended = TextRetrieval.bm25TopKIndexed(spark, dir, qs, "qid", "qtext", k = 5)
      .collect().map(_.toString).sorted.toSeq

    val full = java.nio.file.Files.createTempDirectory("bm25full").toString + "/idx"
    TextRetrieval.buildBm25Index(docs, "text", "doc_id", full)
    val rebuilt = TextRetrieval.bm25TopKIndexed(spark, full, qs, "qid", "qtext", k = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(appended == rebuilt)
    // the appended docs are actually findable (df/stats were rebuilt)
    assert(appended.exists(_.contains("4")), appended.mkString(","))
  }

  test("a retried bm25IndexAppend leaves scores identical (postings dedup + distinct df)") {
    val dir = java.nio.file.Files.createTempDirectory("bm25retry").toString + "/idx"
    val first = docs.filter(col("doc_id") <= 3L)
    val extra = docs.filter(col("doc_id") > 3L)
    TextRetrieval.buildBm25Index(first, "text", "doc_id", dir)
    TextRetrieval.bm25IndexAppend(extra, "text", "doc_id", dir)
    val qs = Seq((1, "spark fast runs"), (2, "padding text")).toDF("qid", "qtext")
    val single = TextRetrieval.bm25TopKIndexed(spark, dir, qs, "qid", "qtext", k = 5)
      .collect().map(_.toString).sorted.toSeq
    // the crash-retried append: identical postings rows land twice —
    // tf contributions must not double and df must not inflate
    TextRetrieval.bm25IndexAppend(extra, "text", "doc_id", dir)
    val doubled = TextRetrieval.bm25TopKIndexed(spark, dir, qs, "qid", "qtext", k = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(doubled == single, "a retried bm25IndexAppend changed scores")
    // the marker-absent fallback derives df/stats retry-safely too
    val fs = new org.apache.hadoop.fs.Path(dir, "_stats_consistent")
      .getFileSystem(graft.sources.ParquetIO.hadoopConf)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_stats_consistent"), false)
    val fallback = TextRetrieval.bm25TopKIndexed(spark, dir, qs, "qid", "qtext", k = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(fallback == single, "marker-absent fallback diverged after retry")
  }

  test("missing consistency marker: indexed search derives df/stats from postings") {
    val dir = java.nio.file.Files.createTempDirectory("bm25mk").toString + "/idx"
    TextRetrieval.buildBm25Index(docs, "text", "doc_id", dir)
    val qs = Seq((1, "spark fast runs")).toDF("qid", "qtext")
    val withMarker = TextRetrieval.bm25TopKIndexed(spark, dir, qs, "qid", "qtext", k = 5)
      .collect().map(_.toString).sorted.toSeq

    // simulate a crash mid-maintenance: marker gone AND the derived
    // tables poisoned (stale stats would silently skew scores — the
    // fallback must not read them at all)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      graft.sources.ParquetIO.hadoopConf)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_stats_consistent"), false)
    Seq((9999.0, 1.0)).toDF("nd", "sdl")
      .write.format("kv").option("path", s"$dir/stats").mode("overwrite").save()

    val fallback = TextRetrieval.bm25TopKIndexed(spark, dir, qs, "qid", "qtext", k = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(fallback == withMarker, "fallback must rederive from postings")
  }

  test("bm25 is deterministic across partition layouts") {
    val spread = TextRetrieval.bm25TopK(docs.repartition(7), Seq((1, "spark fast runs"))
      .toDF("qid", "qtext"), "text", "doc_id", "qid", "qtext", k = 5)
      .collect().map(_.toString).sorted.toSeq
    val narrow = TextRetrieval.bm25TopK(docs.coalesce(1), Seq((1, "spark fast runs"))
      .toDF("qid", "qtext"), "text", "doc_id", "qid", "qtext", k = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(spread == narrow)
  }
}
