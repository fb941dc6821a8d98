package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Plan construction must be lazy: building an operator's DataFrame runs
  * zero Spark jobs — eager driver-side scalar reads (a `.head()` for a
  * vector dim or a vocabulary total) would run one job per invocation
  * before the query even starts.
  */
class LazyPlanSpec extends SparkSpec {
  import spark.implicits._

  private def jobsDuring(body: => Any): Int = {
    @volatile var jobs = 0
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      Thread.sleep(1000) // listener bus is async; let any JobStart land
      jobs
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("pqKnn / ivfPqKnn / unigramSurprisal build plans without running a job") {
    // Parquet-backed, NOT a local Seq.toDF: a LocalRelation folds through
    // ConvertToLocalRelation and executes scalar probes driver-side with
    // zero jobs, which would mask an eager `.head()` this spec exists to
    // catch.
    val dir = java.nio.file.Files.createTempDirectory("lazyplan").toString
    Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)), (4L, Array(0f, 0f, 0f, 1f)))
      .toDF("vec_id", "embedding").write.parquet(s"$dir/vecs")
    Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
      .write.parquet(s"$dir/docs")
    val vecs = spark.read.parquet(s"$dir/vecs")
    val docs = spark.read.parquet(s"$dir/docs")
    val n = jobsDuring {
      SimilaritySearch.pqKnn(vecs, vecs.filter(col("vec_id") === 1L),
        "embedding", "vec_id", k = 2, m = 2, nCells = 2, maxTrainPerCell = 8)
      SimilaritySearch.ivfPqKnn(vecs, vecs.filter(col("vec_id") === 1L),
        "embedding", "vec_id", k = 2, nCells = 2, nProbe = 1, m = 2,
        pqCells = 2, maxTrainPerCell = 8)
      Curation.unigramSurprisal(docs, "text", "doc_id")
      // lazy histogram persist: construction must not materialize it
      Curation.importanceResample(docs, docs.select(col("text")),
        "text", "doc_id", k = 1, buckets = 64)
      Dedup.decontaminateBloom(docs, docs, "text", "doc_id")
    }
    assert(n == 0, s"plan construction ran $n Spark jobs")
  }

  test("PQ subspace split fails fast when dim does not divide by m") {
    val vecs = Seq((1L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      SimilaritySearch.pqKnn(vecs, vecs.filter(col("vec_id") === 1L),
        "embedding", "vec_id", k = 1, m = 2, nCells = 2, maxTrainPerCell = 8)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("must divide into 2 subspaces")), ex.toString)
  }
}
