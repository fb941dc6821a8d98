package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorExpressions.{arrayDot, l2Norm}

/** Embedding-column operators (similarity search over `embeddings`).
  *
  * Dot products / norms use the native codegen'd `array_dot` expression
  * ([[graft.functions.VectorExpressions]]) — a primitive loop inside
  * whole-stage codegen. Elements are cast float→double before any
  * arithmetic and folded left-to-right, matching DuckDB's list_sum fold,
  * so similarity values are bit-comparable and the oracle hash-match
  * holds without fuzz.
  *
  * The brute-force k-NN here is the exactness baseline: a broadcast of the
  * (tiny) query set against the full corpus — embarrassingly parallel, no
  * shuffle of the corpus side. The scale path (LSH-bucketed ANN that prunes
  * the corpus before scoring) is [[graft.operators.SimilaritySearch]].
  */
object VectorQueries {

  /** embedding (array<float>) → array<double>, named `e`. */
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("e"))


  /** Unrolled k-stage greedy MMR replay: stage CTEs mirror the operator's
    * exact integer arithmetic (micro-unit sims, milli-unit λ, nid-asc
    * ties), so the whole greedy trajectory is value-checked.
    */
  private def mmrOracle(k: Int, pool: Int, lambdaMilli: Int, queryPred: String): String = {
    val lam = lambdaMilli
    val mu = 1000 - lambdaMilli
    def dotOf(a: String, b: String) =
      s"list_sum(list_transform(generate_series(1, len($a.e)), i -> $a.e[i] * $b.e[i]))"
    val stages = (2 to k).map { t =>
      s"""sel$t AS (
         |  SELECT qid, nid, rel, $t AS rnk FROM (
         |    SELECT r.qid, r.nid, r.rel,
         |      row_number() OVER (PARTITION BY r.qid
         |        ORDER BY ($lam * r.rel - $mu * m.maxsim) DESC, r.nid) AS rn
         |    FROM cand r
         |    JOIN (SELECT p.qid, p.nid, max(p.ps) AS maxsim
         |          FROM pairs p JOIN selall${t - 1} s
         |            ON p.qid = s.qid AND p.other = s.nid
         |          GROUP BY 1, 2) m ON m.qid = r.qid AND m.nid = r.nid
         |    WHERE NOT EXISTS (SELECT 1 FROM selall${t - 1} s2
         |                      WHERE s2.qid = r.qid AND s2.nid = r.nid)
         |  ) WHERE rn = 1
         |), selall$t AS (
         |  SELECT * FROM selall${t - 1} UNION ALL SELECT * FROM sel$t
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH n AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
       |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
       |  FROM embeddings
       |), p0 AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS nid,
       |    ${dotOf("q", "c")} / (q.nrm * c.nrm) AS sim
       |  FROM n q JOIN n c ON ($queryPred) AND c.vec_id <> q.vec_id
       |), cand AS (
       |  SELECT qid, nid, CAST(floor(sim * 1000000.0 + 0.5) AS BIGINT) AS rel
       |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
       |          ORDER BY sim DESC, nid) AS rn FROM p0)
       |  WHERE rn <= $pool
       |), pairs AS (
       |  SELECT a.qid, a.nid, b.nid AS other,
       |    CAST(floor(${dotOf("x", "y")} / (x.nrm * y.nrm) * 1000000.0 + 0.5)
       |      AS BIGINT) AS ps
       |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.nid <> b.nid
       |  JOIN n x ON x.vec_id = a.nid
       |  JOIN n y ON y.vec_id = b.nid
       |), sel1 AS (
       |  SELECT qid, nid, rel, 1 AS rnk FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid
       |      ORDER BY rel DESC, nid) AS rn FROM cand
       |  ) WHERE rn = 1
       |), selall1 AS (SELECT * FROM sel1), $stages
       |SELECT qid, nid, rel AS rel_micro, CAST(rnk AS INT) AS rnk
       |FROM selall$k
       |ORDER BY qid, rnk""".stripMargin
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Margin-based bitext mining (the LASER/CCMatrix recipe): label-0
    // vectors as the source "language", label-1 as the target; ratio
    // margin in exact integer milli-units, best target per source above
    // threshold — the full k-NN + margin chain replays in the oracle.
    "q_embed_margin_mine" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      graft.operators.SimilaritySearch.marginMine(
        emb.filter(col("label") === 0), emb.filter(col("label") === 1),
        "embedding", "vec_id", k = 4, minMarginMilli = 1000)
        .orderBy(col("src_id"))
    }),

    // MMR diversified rerank: top-15 cosine pool per query, greedy top-5
    // at λ=0.7 penalizing similarity to already-selected — the whole
    // greedy trajectory replays in the oracle's unrolled stages.
    "q_embed_mmr" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      graft.operators.SimilaritySearch.mmrRerank(
        emb, emb.filter(col("vec_id") < 3), "embedding", "vec_id",
        k = 5, poolSize = 15, lambdaMilli = 700)
        .orderBy(col("qid"), col("rnk"))
    }),

    // L2 norms — sanity/oracle anchor for all similarity math.
    "q_embed_norms" -> ((s, dir) => {
      emb(s, dir)
        .select(col("vec_id"), col("label"),
          round(l2Norm(col("e")), 6).as("l2_norm"))
        .orderBy(col("vec_id"))
    }),

    // Brute-force cosine top-5 for query vectors vec_id < 10: broadcast the
    // query side, score corpus partitions in place, per-query top-k via
    // the bounded-heap aggregate (at 1000 executors: corpus never moves,
    // map-side partials keep 5 rows per query per partition — no window
    // funneling every candidate through one reducer).
    "q_embed_knn" -> ((s, dir) => {
      val n = emb(s, dir).withColumn("nrm", l2Norm(col("e")))
      val q = n.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qn"))
      val c = n.select(col("vec_id").as("nid"), col("e").as("ne"), col("nrm").as("nn"))
      broadcast(q).join(c, col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          (arrayDot(col("qe"), col("ne")) / (col("qn") * col("nn"))).as("sim"))
        .groupBy(col("qid"))
        .agg(graft.functions.BoundedTopK.topK(struct(col("sim"), col("nid")), 5).as("top"))
        .select(col("qid"), posexplode(col("top")).as(Seq("pos", "s")))
        .select(col("qid"), col("s.nid").as("nid"),
          round(col("s.sim"), 6).as("sim"), (col("pos") + 1).cast("int").as("rnk"))
        .orderBy(col("qid"), col("rnk"))
    }),

    // Label-centroid similarity structure: average pairwise cosine within a
    // label, via per-label exact pair scoring (labels are tiny here; the
    // LSH path replaces this at scale).
    "q_embed_label_pairs" -> ((s, dir) => {
      val n = emb(s, dir).withColumn("nrm", l2Norm(col("e")))
        .filter(col("vec_id") < 100)
      val a = n.select(col("label"), col("vec_id").as("ida"), col("e").as("ea"), col("nrm").as("na"))
      val b = n.select(col("label").as("lb"), col("vec_id").as("idb"), col("e").as("eb"), col("nrm").as("nb"))
      a.join(b, col("label") === col("lb") && col("ida") < col("idb"))
        .select(col("label"),
          (arrayDot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("sim"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_pairs"), round(avg(col("sim")), 6).as("avg_sim"))
        .orderBy(col("label"))
    }),
  )

  def oracles: Map[String, String] = Map(
    "q_embed_mmr" -> mmrOracle(k = 5, pool = 15, lambdaMilli = 700,
      queryPred = "q.vec_id < 3"),

    "q_embed_margin_mine" ->
      """WITH n AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
        |  FROM embeddings
        |), p AS (
        |  SELECT x.vec_id AS xid, y.vec_id AS yid,
        |    list_sum(list_transform(generate_series(1, len(x.e)),
        |      i -> x.e[i] * y.e[i])) / (x.nrm * y.nrm) AS sim
        |  FROM n x JOIN n y ON x.label = 0 AND y.label = 1
        |), fwd AS (
        |  SELECT xid, yid, CAST(floor(sim * 1000000.0 + 0.5) AS BIGINT) AS cm
        |  FROM (SELECT *, row_number() OVER (PARTITION BY xid
        |          ORDER BY sim DESC, yid) AS rn FROM p) WHERE rn <= 4
        |), bwd AS (
        |  SELECT yid, CAST(floor(sim * 1000000.0 + 0.5) AS BIGINT) AS cm
        |  FROM (SELECT *, row_number() OVER (PARTITION BY yid
        |          ORDER BY sim DESC, xid) AS rn FROM p) WHERE rn <= 4
        |), sx AS (SELECT xid, CAST(sum(cm) AS BIGINT) AS sx FROM fwd GROUP BY 1
        |), sy AS (SELECT yid, CAST(sum(cm) AS BIGINT) AS sy FROM bwd GROUP BY 1
        |), m AS (
        |  SELECT f.xid, f.yid, (8000 * f.cm) // (sx.sx + sy.sy) AS margin_milli
        |  FROM fwd f JOIN sx USING (xid) JOIN sy USING (yid)
        |  WHERE f.cm >= 0 AND sx.sx + sy.sy > 0
        |), best AS (
        |  SELECT xid, yid, margin_milli,
        |    row_number() OVER (PARTITION BY xid
        |      ORDER BY CAST(margin_milli AS DOUBLE) DESC, yid) AS rn
        |  FROM m
        |)
        |SELECT xid AS src_id, yid AS tgt_id, margin_milli
        |FROM best WHERE rn = 1 AND margin_milli >= 1000
        |ORDER BY src_id""".stripMargin,

    "q_embed_norms" ->
      """SELECT vec_id, label,
        |  round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> x * x))), 6) AS l2_norm
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,

    "q_embed_knn" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
        |  FROM embeddings
        |), p AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS nid,
        |    list_sum(list_transform(generate_series(1, len(q.e)),
        |      i -> q.e[i] * c.e[i])) / (q.nrm * c.nrm) AS sim
        |  FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
        |), r AS (
        |  SELECT qid, nid, sim,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INT) AS rnk
        |  FROM p
        |)
        |SELECT qid, nid, round(sim, 6) AS sim, rnk
        |FROM r WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,

    "q_embed_label_pairs" ->
      """WITH n AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
        |  FROM embeddings WHERE vec_id < 100
        |), p AS (
        |  SELECT a.label,
        |    list_sum(list_transform(generate_series(1, len(a.e)),
        |      i -> a.e[i] * b.e[i])) / (a.nrm * b.nrm) AS sim
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
        |)
        |SELECT label, count(*) AS n_pairs, round(avg(sim), 6) AS avg_sim
        |FROM p
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
  )
}
