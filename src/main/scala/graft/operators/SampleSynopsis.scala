package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{BoundedTopK, PrioritySample, Sketches}

/** Mergeable bottom-k row samples — the sketch-matrix discipline
  * (build / persisted rollup / streaming ingest) applied to SAMPLING.
  *
  * A uniform sample of a 100 TB corpus cannot be `ORDER BY rand()`:
  * rand() is not reproducible across retries, a global sort shuffles
  * everything, and the sample cannot be maintained incrementally. The
  * synopsis here is the k rows whose splitmix64(id) hashes are smallest
  * in UNSIGNED order ("bottom-k" / hash-priority sampling — the sample
  * half of the KMV synopsis, Bar-Yossef et al. RANDOM'02): a pure
  * function of the row SET, so
  *
  *   - it is a uniform-without-replacement sample (splitmix64 is a
  *     fixed bijection, so ranking by hash is a fixed random permutation
  *     of ids);
  *   - map-side partial aggregation keeps k rows per partition and
  *     shuffles only those ([[BoundedTopK]] state);
  *   - the bottom-k of a UNION of per-source bottom-k sets is the
  *     bottom-k of the union multiset (any row in the global bottom-k
  *     is in its own source's bottom-k), so persisted per-source sample
  *     tables roll up to the corpus sample BIT-IDENTICALLY;
  *   - per-window samples drain from a stream order-free (the same
  *     confluence as the HLL/CMS/KMV/KLL windowed-ingest gates).
  *
  * The weighted variant is Duffield–Lund–Thorup priority sampling
  * ([[PrioritySample]]): priorities q = w/u on an exact 2^53 integer
  * lattice, top-k by q, and the τ-threshold estimator reads the TOTAL
  * weight of the corpus off the k-row sample — replayed term-for-term
  * by the DuckDB oracle in HUGEINT.
  */
object SampleSynopsis {

  /** Signed column whose ascending order equals the UNSIGNED ascending
    * order of the 64-bit hash `h` (flip the sign bit).
    */
  private def flipped(h: Column): Column = h.bitwiseXOR(lit(Long.MinValue))

  /** Bottom-k-by-stored-hash aggregate: keeps the k rows whose `h` is
    * smallest unsigned, with `payload` fields carried along. Result is
    * an array<struct> sorted ascending by unsigned hash; the struct
    * holds (s: score for the heap, pf: flipped hash, h: the raw hash —
    * persisted so rollups never re-derive it — then the payload).
    */
  def aggFromHash(h: Column, k: Int, payload: (String, Column)*): Column = {
    val pf = flipped(h)
    // BoundedTopK keeps score DESC then remaining fields ASC: score
    // -pf(double) makes "best" = smallest unsigned hash at 53-bit
    // granularity, and pf itself is the exact ascending tiebreak.
    val fields = (-pf.cast("double")).as("s") +: pf.as("pf") +: h.as("h") +:
      payload.map { case (n, c) => c.as(n) }
    BoundedTopK.topK(struct(fields: _*), k)
  }

  /** Uniform bottom-k sample aggregate over a unique long id column. */
  def uniformAgg(idCol: Column, k: Int, payload: (String, Column)*): Column =
    aggFromHash(Sketches.splitmixLong(idCol), k, payload: _*)

  /** Explode a sample array into ranked rows: `rnk` (1-based, ascending
    * unsigned hash), `h`, then the payload fields.
    */
  def explodeSample(df: DataFrame, sampleCol: String,
      keep: Seq[String], payload: Seq[String]): DataFrame = {
    val keepCols = keep.map(col)
    df.select(keepCols :+ posexplode(col(sampleCol)).as(Seq("pos", "t")): _*)
      .select(keepCols ++ Seq((col("pos") + 1).cast("int").as("rnk"),
        col("t.h").as("h")) ++ payload.map(p => col(s"t.$p").as(p)): _*)
  }

  /** Direct corpus-wide uniform sample: k rows, ranked. */
  def uniform(df: DataFrame, idCol: String, k: Int,
      payload: Seq[String]): DataFrame =
    explodeSample(
      df.agg(uniformAgg(col(idCol), k,
        payload.map(p => p -> col(p)): _*).as("smp")),
      "smp", Seq.empty, payload)

  /** Roll persisted sample rows (carrying their stored `h`) back up
    * into the bottom-k of the union — bit-identical to the direct
    * build over the raw union (the k smallest of a union of k-smallest
    * sets IS the union's k smallest).
    */
  def rollup(stored: DataFrame, hCol: String, k: Int,
      payload: Seq[String]): DataFrame =
    explodeSample(
      stored.agg(aggFromHash(col(hCol), k,
        payload.map(p => p -> col(p)): _*).as("smp")),
      "smp", Seq.empty, payload)

  /** Grouped rollup: collapse persisted sample rows over the dimensions
    * NOT in `keep`, yielding one bottom-k sample per surviving group —
    * the matrix read path. A per-(source × window) cell table rolls up
    * to per-window samples (keep = window), per-source samples (keep =
    * source), or the corpus sample (keep = ∅ — [[rollup]]), each
    * BIT-IDENTICAL to the direct build over that slice: every row of a
    * slice's bottom-k is in its own cell's bottom-k, so the union+trim
    * lemma applies per group. One synopsis table serves every
    * marginalization — nothing is rebuilt, no raw data is re-scanned.
    */
  def rollupBy(stored: DataFrame, hCol: String, k: Int,
      keep: Seq[String], payload: Seq[String]): DataFrame =
    explodeSample(
      stored.groupBy(keep.map(col): _*).agg(aggFromHash(col(hCol), k,
        payload.map(p => p -> col(p)): _*).as("smp")),
      "smp", keep, payload)

  /** DLT priority sample + total-weight estimate: the k highest
    * priorities q = ⌊w/u⌋ (exact decimal ordering, id ascending
    * tiebreak), τ = the (k+1)-th priority (0 when the corpus has ≤ k
    * rows — the sample is then complete and the estimate EXACT), and
    * Ŵ = Σ max(w_i, τ) as `est_total` (the DLT estimator; every term
    * is already an integer, so the sum replays exactly).
    *
    * Returns the k sampled rows (rnk, id, weight) with the constant
    * `est_total` column. `orderBy(q desc).limit(k+1)` compiles to
    * TakeOrderedAndProject — per-partition top-(k+1) heaps, never a
    * global sort.
    */
  def weighted(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    val q = PrioritySample.weightedPriority(
      Sketches.splitmixLong(col(idCol)), col(weightCol))
    val top = df.select(col(idCol).as("id"),
        col(weightCol).cast("long").as("w"), q.as("q"))
      .orderBy(col("q").desc, col("id"))
      .limit(k + 1)
    val ranked = top.withColumn("rnk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("q").desc, col("id"))))
    val tau = ranked.agg(coalesce(max(when(col("rnk") === k + 1, col("q"))),
      lit(0).cast("decimal(38,0)")).as("tau"))
    val sampled = ranked.filter(col("rnk") <= k)
    val est = sampled.crossJoin(broadcast(tau))
      .agg(sum(greatest(col("w").cast("decimal(38,0)"), col("tau")))
        .cast("long").as("est_total"))
    sampled.crossJoin(broadcast(est))
      .select(col("rnk"), col("id"), col("w"), col("est_total"))
  }

  /** DLT priority sampling as a MERGEABLE aggregate — the weighted
    * sample joins the maintenance matrix the uniform sample already
    * has. Priorities q = ⌊w·2^53/u⌋ ([[PrioritySample]], exact integer
    * lattice) are a pure function of (id, w), so the subset-rank lemma
    * holds in priority order exactly as it does in hash order: the
    * top-k of a union of per-batch top-k sets IS the union's top-k.
    * Struct layout: (s ≈ q as double — the heap score, monotone in q;
    * nq = −q — the exact DESC tiebreak under ASC ordering; id; w).
    * Persist k+1 ranks so the estimator's τ (the (k+1)-th priority)
    * survives rollup exactly.
    */
  def priorityAgg(idCol: Column, weightCol: Column, k: Int): Column = {
    val q = PrioritySample.weightedPriority(
      Sketches.splitmixLong(idCol), weightCol)
    BoundedTopK.topK(struct(q.cast("double").as("s"), (-q).as("nq"),
      idCol.as("id"), weightCol.cast("long").as("w")), k)
  }

  /** Explode a [[priorityAgg]] array into ranked rows (rnk 1-based =
    * priority descending) carrying the exact negated priority `nq`.
    */
  def explodePriority(df: DataFrame, sampleCol: String,
      keep: Seq[String]): DataFrame = {
    val keepCols = keep.map(col)
    df.select(keepCols :+ posexplode(col(sampleCol)).as(Seq("pos", "t")): _*)
      .select(keepCols ++ Seq((col("pos") + 1).cast("int").as("rnk"),
        col("t.nq").as("nq"), col("t.id").as("id"), col("t.w").as("w")): _*)
  }

  /** Re-aggregate stored priority rows into the union's top-k —
    * bit-identical to the direct build (the lemma above). `keep`
    * groups run one merge per surviving dimension.
    */
  def rollupPriority(stored: DataFrame, k: Int,
      keep: Seq[String] = Seq.empty): DataFrame =
    explodePriority(
      stored.groupBy(keep.map(col): _*)
        .agg(BoundedTopK.topK(struct((-col("nq")).cast("double").as("s"),
          col("nq"), col("id"), col("w")), k).as("smp")),
      "smp", keep)

  /** The DLT τ-threshold total-weight estimate from ranked priority
    * rows (which must hold k+1 ranks when over capacity): τ = the
    * (k+1)-th priority (0 under capacity — the estimate is then
    * EXACT), Ŵ = Σ_{rnk≤k} max(w, τ). One row: est_total.
    */
  def priorityEstimate(rows: DataFrame, k: Int): DataFrame = {
    val tau = rows.agg(coalesce(max(when(col("rnk") === k + 1,
      -col("nq"))), lit(0).cast("decimal(38,0)")).as("tau"))
    rows.filter(col("rnk") <= k).crossJoin(broadcast(tau))
      .agg(sum(greatest(col("w").cast("decimal(38,0)"), col("tau")))
        .cast("long").as("est_total"))
  }

  private val Two64 = new java.math.BigDecimal("18446744073709551616")

  /** Unsigned 64-bit value of a signed hash column, as DECIMAL(38,0). */
  private def huDec(h: Column): Column =
    when(h < 0, h.cast("decimal(38,0)") + lit(Two64))
      .otherwise(h.cast("decimal(38,0)"))

  /** Coordinated join-key synopsis: ONE pass groups the table by its
    * join key into (key, cnt) and keeps the k keys with the smallest
    * unsigned splitmix64(key). Because every table hashes keys with the
    * SAME fixed hash, two synopses are COORDINATED samples (correlated
    * sampling, Vengerov et al. VLDB'15): below the coverage threshold
    * τ = min(τ_A, τ_B) BOTH synopses retain every key of their table,
    * so the sampled join is exact under τ and scales by 1/p = 2^64/τ.
    */
  def buildJoinKeySynopsis(df: DataFrame, keyCol: String, path: String,
      k: Int): Unit =
    buildJoinKeySynopsis(df, keyCol, path, k, Seq.empty)

  /** As above, but each synopsis row additionally carries per-key
    * PREDICATE-conditioned counts (`preds` = name → boolean column,
    * counted in the same single grouping pass). A probe can then price
    * |σ_p(A) ⋈ B| for any predicate recorded at build time from the
    * stored rows alone: below τ both synopses are complete, and the
    * per-key filtered count is exact there, so the correlated-sampling
    * estimator applies unchanged with cntA swapped for the predicate
    * column. Costs k extra longs per predicate — the synopsis stays a
    * few KB however large the table.
    */
  def buildJoinKeySynopsis(df: DataFrame, keyCol: String, path: String,
      k: Int, preds: Seq[(String, Column)]): Unit =
    joinKeySynopsisRows(df, keyCol, k, preds)
      .write.format("kv").option("path", path).mode("overwrite").save()

  /** The synopsis as a frame — (h, key, cnt, preds…) rows — for callers
    * that append (incremental/streaming maintenance) or partition the
    * rows by an extra dimension before persisting. `keep` columns are
    * carried as grouping dimensions: one independent bottom-k synopsis
    * per keep-group (the per-window drift matrix).
    */
  def joinKeySynopsisRows(df: DataFrame, keyCol: String, k: Int,
      preds: Seq[(String, Column)] = Seq.empty,
      keep: Seq[String] = Seq.empty): DataFrame = {
    val predAggs = preds.map { case (n, c) =>
      count(when(c, lit(1))).as(n) }
    val per = df.groupBy(keep.map(col) :+ col(keyCol).as("key"): _*)
      .agg(count(lit(1)).as("cnt"), predAggs: _*)
    joinKeySynopsisFromCounts(per, k, "cnt" +: preds.map(_._1), keep)
  }

  /** The bottom-k trim of [[joinKeySynopsisRows]] over an ALREADY
    * per-key-counted frame (`key`, count columns, `keep` dims) — for
    * callers that derive several synopses from ONE shared grouping pass
    * (filter-then-count ≡ count-per-group-then-filter, so a synopsis
    * built from a filtered slice of a shared (dim, key, cnt) frame is
    * bit-identical to the direct filtered build).
    */
  def joinKeySynopsisFromCounts(per: DataFrame, k: Int,
      cntCols: Seq[String] = Seq("cnt"),
      keep: Seq[String] = Seq.empty): DataFrame =
    explodeSample(
      per.groupBy(keep.map(col): _*).agg(uniformAgg(col("key"), k,
        ("key" -> col("key")) +: cntCols.map(n => n -> col(n)): _*).as("smp")),
      "smp", keep, "key" +: cntCols)
      .select(keep.map(col) ++ (col("h") +: col("key") +: cntCols.map(col)): _*)

  /** Merge appended per-batch synopsis rows back into the table's
    * synopsis — BIT-IDENTICAL to a direct rebuild over the union. Two
    * facts carry the lemma from plain samples to (key, cnt) synopses:
    * ranks only shrink on subsets (any key of the union's bottom-k is
    * in every contributing batch's bottom-k — each batch's key set is
    * a subset of the union's), so for such a key EVERY batch that saw
    * it kept it, and summing its per-batch counts reconstructs the
    * exact union count. Grouping by `keep` runs one merge per group.
    */
  def rollupJoinSynopsis(stored: DataFrame, k: Int,
      cntCols: Seq[String] = Seq("cnt"),
      keep: Seq[String] = Seq.empty): DataFrame = {
    val summed = stored.groupBy(keep.map(col) :+ col("key"): _*)
      .agg(min(col("h")).as("h"),
        cntCols.map(c => sum(col(c)).cast("long").as(c)): _*)
    explodeSample(
      summed.groupBy(keep.map(col): _*).agg(aggFromHash(col("h"), k,
        ("key" -> col("key")) +: cntCols.map(c => c -> col(c)): _*).as("smp")),
      "smp", keep, "key" +: cntCols)
      .select(keep.map(col) ++
        (col("h") +: col("key") +: cntCols.map(col)): _*)
  }

  /** |A ⋈ B| (equi-join pair count) estimated from two stored
    * [[buildJoinKeySynopsis]] tables ALONE — zero raw-table scans:
    * τ_side = 2^64 when the synopsis is under capacity (it then holds
    * EVERY key of its table) else the k-th smallest stored hash;
    * τ = min; J = Σ cntA·cntB over keys with h < τ (both sides
    * complete below τ, so J is an exact subsample of the join);
    * estimate = ⌊J·2^64/τ⌋ — EXACT when both synopses are complete.
    * One row: (est_pairs). Every step replays in HUGEINT.
    */
  def joinSizeEstimate(spark: org.apache.spark.sql.SparkSession,
      pathA: String, pathB: String, k: Int): DataFrame =
    joinSizeEstimate(spark, pathA, pathB, k, "cnt", "cnt")

  /** As above with selectable per-side count columns — pass a
    * predicate-count column recorded by [[buildJoinKeySynopsis]] to
    * price the FILTERED join |σ_p(A) ⋈ σ_q(B)| from the same stored
    * synopses (the unfiltered `cnt` stays the default).
    */
  def joinSizeEstimate(spark: org.apache.spark.sql.SparkSession,
      pathA: String, pathB: String, k: Int,
      cntColA: String, cntColB: String): DataFrame = {
    def side(p: String) =
      spark.read.format("kv").option("path", p).load()
    joinSizeEstimateFrames(side(pathA), side(pathB), k, cntColA, cntColB)
  }

  /** The correlated-sampling estimator over synopsis FRAMES, one
    * estimate per `keep`-group (none → one global row): τ per group per
    * side (2^64 when that group's synopsis is under capacity — it then
    * holds every key, and a group exact on both sides estimates
    * EXACTLY), J = Σ cntA·cntB over joined keys under τ,
    * est = ⌊J·2^64/τ⌋. Groups are those present in BOTH synopses (an
    * equi-join needs both sides). The whole pipeline touches only
    * synopsis rows — at 100 TB the τ/J frames are KBs and broadcast.
    */
  def joinSizeEstimateFrames(sa0: DataFrame, sb0: DataFrame, k: Int,
      cntColA: String = "cnt", cntColB: String = "cnt",
      keep: Seq[String] = Seq.empty): DataFrame = {
    import graft.functions.PrioritySample
    // uniform grouped code path: a constant group when keep is empty
    val g = if (keep.isEmpty) Seq("__g") else keep
    def prep(s: DataFrame, suf: String, cn: String) = {
      val base = if (keep.isEmpty) s.withColumn("__g", lit(0)) else s
      base.select(g.map(col) ++ Seq(col("h").as(s"h$suf"), col("key"),
        col(cn).as(s"cnt$suf")): _*)
    }
    val sa = prep(sa0, "a", cntColA)
    val sb = prep(sb0, "b", cntColB)
    def tauOf(s: DataFrame, h: String, out: String) =
      s.groupBy(g.map(col): _*).agg(
        when(count(lit(1)) < k, lit(Two64))
          .otherwise(max(huDec(col(h)))).cast("decimal(38,0)").as(out))
    val tau = tauOf(sa, "ha", "tau_a")
      .join(broadcast(tauOf(sb, "hb", "tau_b")), g)
      .select(g.map(col) :+ least(col("tau_a"), col("tau_b")).as("tau"): _*)
    val joined = sa.join(sb, g :+ "key")
      .join(broadcast(tau), g)
      .filter(huDec(col("ha")) < col("tau"))
      .groupBy(g.map(col): _*)
      .agg(sum(col("cnta") * col("cntb")).cast("decimal(38,0)").as("j"))
    tau.join(joined, g, "left")
      .select(keep.map(col) :+
        PrioritySample.floorDiv(
          coalesce(col("j"), lit(0).cast("decimal(38,0)")) * lit(Two64),
          col("tau")).cast("long").as("est_pairs"): _*)
  }
}
