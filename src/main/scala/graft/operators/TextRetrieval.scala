package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.BoundedTopK

/** Sparse (keyword) retrieval over the document corpus — the lexical half
  * of a retrieval stack next to the dense ANN tiers in
  * [[SimilaritySearch]]. BM25 is the classic probabilistic ranking
  * function (Robertson & Zaragoza 2009, "The Probabilistic Relevance
  * Framework: BM25 and Beyond"); the idf spelling here is Lucene's
  * non-negative variant `ln(1 + (N - df + 0.5)/(df + 0.5))`.
  */
object TextRetrieval {

  /** BM25 top-k documents per query.
    *
    * Determinism contract (the codebase convention): every per-(term,doc)
    * contribution `idf(term) · tf·(k1+1)/(tf + k1·(1−b + b·dl/avgdl))`
    * is computed in a FIXED left-associative double op order and
    * integer-quantized (`floor(x·1e6 + 0.5)`) BEFORE the per-(query,doc)
    * sum — so the score is an order-free integer sum of micro-units that
    * any engine replays exactly (a float Σ over terms would fold in
    * partition order). Output is `(qid, doc_id, score_micro, rnk)` with
    * ties broken doc_id-asc inside the same bounded-heap sort.
    *
    * Scale shape (the inverted-index plan without materializing one):
    * the corpus term stream is cut down to query terms by a BROADCAST
    * semi-join BEFORE any shuffle, so the only corpus-keyed aggregation
    * (`tf`) shuffles matched (term, doc) pairs only; document frequency
    * and corpus stats are ≤|terms| and 1-row broadcast frames; per-query
    * top-k is the bounded-heap aggregate (k-row map-side partials, never
    * a window over all matches). Nothing corpus-sized crosses the wire —
    * at 1000 executors the full-corpus work is two row-local passes
    * (length stats + term match).
    *
    * Tokenization is the corpus convention: lowercase, single-space
    * split (`q_doc_token_count` parity). Query terms are deduplicated
    * (set semantics — standard for short keyword queries).
    */
  def bm25TopK(
      docs: DataFrame, queries: DataFrame,
      textCol: String, idCol: String,
      queryIdCol: String, queryTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1 > 0.0 && b >= 0.0 && b <= 1.0, s"bad BM25 params k1=$k1 b=$b")

    val d = docs.select(col(idCol).as("doc_id"),
        split(lower(col(textCol)), " ").as("terms"))
      .withColumn("dl", size(col("terms")).cast("double"))
    // 1-row corpus stats frame: doc count + total length
    val stats = d.agg(count(lit(1)).cast("double").as("nd"),
      sum(col("dl")).as("sdl"))
    // (qid, term) pairs, distinct per query — tiny, broadcast
    val qt = queries.select(col(queryIdCol).as("qid"),
      explode(array_distinct(split(lower(col(queryTextCol)), " "))).as("term"))
    val qTerms = qt.select(col("term")).distinct()

    // corpus term stream restricted to query terms BEFORE the tf shuffle
    val matched = d.select(col("doc_id"), col("dl"), explode(col("terms")).as("term"))
      .join(broadcast(qTerms), Seq("term"))
    val tf = matched.groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).cast("double").as("tf"))
    // document frequency per query term (≤ |query terms| rows)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("dfq"))

    val scored = tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sdl") / col("nd"))
      .withColumn("idf",
        log(lit(1.0) + (col("nd") - col("dfq") + lit(0.5)) / (col("dfq") + lit(0.5))))
      .withColumn("tfp", col("tf") * lit(k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .withColumn("c", floor(col("idf") * col("tfp") * lit(1e6) + lit(0.5)))

    val perQuery = broadcast(qt).join(scored, Seq("term"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("c")).as("score_micro"))
    perQuery.groupBy(col("qid"))
      .agg(BoundedTopK.topK(
        struct(col("score_micro").cast("double").as("sm"), col("doc_id")), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("qid"), col("s.doc_id").as("doc_id"),
        col("s.sm").cast("long").as("score_micro"),
        (col("pos") + 1).cast("int").as("rnk"))
  }
}
