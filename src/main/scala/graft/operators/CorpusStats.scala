package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.KmvDistinct.kmvDistinct

/** ANALYZE-style table statistics in one pass: per-column null count,
  * min/max (orderable types), and approximate NDV via the KMV sketch —
  * the inputs a cost-based planner (or a 100 TB pipeline operator
  * choosing broadcast vs shuffle, or bands vs exact dedup) needs.
  *
  * Single aggregation job: every statistic is a partial-aggregable
  * expression, so the pass is one scan + one 1-row shuffle regardless of
  * table size. Output: one row per column
  * (column, n_rows, n_nulls, approx_ndv, min_str, max_str).
  */
object CorpusStats {

  def collect(df: DataFrame, kmvK: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.schema.fields
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { f =>
      val c = col(f.name)
      val orderable = f.dataType match {
        case _: ArrayType | _: MapType | _: StructType | BinaryType => false
        case _ => true
      }
      Seq(
        sum(c.isNull.cast("long")).as(s"${f.name}__nulls"),
        kmvDistinct(c, kmvK).as(s"${f.name}__ndv")) ++
        (if (orderable) Seq(
          min(c).cast("string").as(s"${f.name}__min"),
          max(c).cast("string").as(s"${f.name}__max"))
        else Seq(lit(null).cast("string").as(s"${f.name}__min"),
          lit(null).cast("string").as(s"${f.name}__max")))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("__n")
    val out = cols.map { f =>
      (f.name, n, row.getAs[Long](s"${f.name}__nulls"),
        row.getAs[Long](s"${f.name}__ndv"),
        Option(row.getAs[String](s"${f.name}__min")).orNull,
        Option(row.getAs[String](s"${f.name}__max")).orNull)
    }.toSeq
    out.toDF("column", "n_rows", "n_nulls", "approx_ndv", "min_str", "max_str")
  }

  /** Exact per-group quantiles over a BINNED value (`round(value,
    * binDecimals)`), with the standard `pos = p·(n−1)` linear
    * interpolation between the straddling order statistics.
    *
    * The scale-sane exact-quantile shape: one hash aggregation to
    * (group, bin) counts — map-side combinable, so the shuffle carries at
    * most |bins| rows per group per partition — then a window over the
    * DISTINCT bins only (bounded by the value range × 10^binDecimals, NOT
    * by corpus size) to get cumulative ranks, and a broadcast join of the
    * tiny (group × quantile) target-rank table back onto the bin ranks.
    * Binning makes the histogram finite; for data already at
    * `binDecimals` precision (money, metrics) the result is the exact
    * quantile. Every arithmetic step is replayed verbatim by the DuckDB
    * oracle — no reliance on engine quantile implementations agreeing.
    *
    * Returns one row per group: (group, n, q_<p> ...) with `p` spelled
    * without the leading "0." (q_25, q_50, q_99).
    */
  def binnedQuantiles(
      df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double], binDecimals: Int = 2): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    val g = col(groupCol)
    val bin = round(col(valueCol), binDecimals)
    val cnts = df.select(g, bin.as("b")).groupBy(g, col("b"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g).orderBy(col("b"))
    // rank interval covered by each bin: [cum - cnt + 1, cum]
    val ranked = cnts.withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("first_rank", col("cum") - col("cnt") + 1L)
    val totals = cnts.groupBy(g).agg(sum(col("cnt")).as("n"))
    val targets = totals
      .select(g, col("n"), explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("pos", col("p") * (col("n") - 1L).cast("double"))
      .withColumn("rlo", floor(col("pos")).cast("long") + 1L)
      .withColumn("rhi", ceil(col("pos")).cast("long") + 1L)
      .withColumn("frac", col("pos") - floor(col("pos")))
    // each target rank lands in exactly one bin's rank interval
    def lookup(rank: Column, as: String): DataFrame =
      broadcast(targets).join(ranked, Seq(groupCol))
        .where(rank >= col("first_rank") && rank <= col("cum"))
        .select(g, col("p"), col("n"), col("frac"), col("b").as(as))
    val joined = lookup(col("rlo"), "vlo")
      .join(lookup(col("rhi"), "vhi"), Seq(groupCol, "p", "n", "frac"))
      .withColumn("q", col("vlo") + (col("vhi") - col("vlo")) * col("frac"))
    def pName(p: Double): String =
      "q_" + BigDecimal(p).bigDecimal.stripTrailingZeros.toPlainString
        .stripPrefix("0.").replace(".", "_")
    joined.groupBy(g)
      .agg(max(col("n")).as("n"),
        ps.map(p => max(when(col("p") === p, col("q"))).as(pName(p))): _*)
  }

  /** One-row dataset card — the release-notes summary every corpus drop
    * ships with: document/token/char totals, exact duplicate-text rate,
    * language count, dominant language + share, and the language-mix
    * entropy in integer micro-nats (one ln per language TYPE, quantized
    * before the sum — order-free and engine-replayable).
    *
    * Scale shape: one pass for the global totals (partial-aggregable,
    * includes the exact distinct-digest count — a 16-byte-key shuffle),
    * one language histogram (|langs| rows), everything else broadcast
    * one-row frames.
    */
  def card(
      df: DataFrame, textCol: String, idCol: String,
      langCol: String): DataFrame = {
    val t = col(textCol)
    val base = df.agg(
      count(lit(1)).as("n_docs"),
      sum(size(graft.functions.WhitespaceTokens.wsTokens(t)).cast("long"))
        .as("n_tokens"),
      sum(length(t).cast("long")).as("n_chars"),
      countDistinct(md5(t)).as("__n_unique"))
    val langs = df.groupBy(col(langCol).as("__lang"))
      .agg(count(lit(1)).as("__c"))
    val p = col("__c").cast("double") / col("__t").cast("double")
    val langStats = langs
      .crossJoin(broadcast(langs.agg(
        sum(col("__c")).as("__t"), count(lit(1)).as("n_langs"))))
      .select(col("__lang"), col("__c"), col("__t"), col("n_langs"),
        floor(lit(1e6) * ((-p) * log(p)) + lit(0.5)).cast("long").as("__h"))
      .agg(max(col("n_langs")).as("n_langs"),
        max(struct(col("__c"), col("__lang"))).as("__top"),
        sum(col("__h")).as("lang_entropy_micro"),
        max(col("__t")).as("__t"))
    base.crossJoin(broadcast(langStats)).select(
      col("n_docs"), col("n_tokens"), col("n_chars"),
      round(lit(1.0) -
        col("__n_unique").cast("double") / col("n_docs").cast("double"), 6)
        .as("dup_rate"),
      col("n_langs"),
      col("__top").getField("__lang").as("top_lang"),
      round(col("__top").getField("__c").cast("double") /
        col("__t").cast("double"), 6).as("top_lang_share"),
      col("lang_entropy_micro"))
  }

  /** Unigram distribution drift between two corpus snapshots — the
    * dataset-release audit for "did the language move?" (new crawl vs
    * last release, post-filter vs pre-filter). Both sides tokenize on
    * lowercased whitespace words; term probabilities are Laplace-smoothed
    * over the UNION vocabulary (p_a = (c_a+1)/(T_a+V)), and each term
    * carries its pointwise KL(A‖B) contribution p_a·ln(p_a/p_b) quantized
    * ONCE to integer micro-nats — corpus-level KL is the exact integer
    * sum of that column, and the returned frame is the top `topN`
    * positive drivers (terms over-represented in A), the release-notes
    * view. Deterministic: one ln per term TYPE, integer compare ties.
    *
    * Scale shape: one partial-aggregable term count per side, a same-key
    * (term) full-outer join of the two count frames, a ONE-row broadcast
    * totals frame, and a bounded-heap global top-N — nothing corpus-sized
    * reaches the driver and the token streams shuffle exactly once each.
    */
  def unigramDrift(
      a: DataFrame, b: DataFrame, textCol: String, topN: Int = 50): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    def counts(df: DataFrame, as: String) =
      df.select(explode(
          graft.functions.WhitespaceTokens.wsTokens(lower(col(textCol)))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as(as))
    val joined = counts(a, "cnt_a")
      .join(counts(b, "cnt_b"), Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    val tot = joined.agg(
      sum(col("cnt_a")).cast("double").as("__ta"),
      sum(col("cnt_b")).cast("double").as("__tb"),
      count(lit(1)).cast("double").as("__v"))
    val pa = (col("cnt_a").cast("double") + lit(1.0)) / (col("__ta") + col("__v"))
    val pb = (col("cnt_b").cast("double") + lit(1.0)) / (col("__tb") + col("__v"))
    val klMicro = floor(lit(1e6) * (pa * log(pa / pb)) + lit(0.5)).cast("long")
    joined.crossJoin(broadcast(tot))
      .select(col("term"), col("cnt_a"), col("cnt_b"), klMicro.as("kl_micro"))
      .agg(graft.functions.BoundedTopK.topK(
        struct(col("kl_micro").cast("double").as("s"), col("term"),
          col("cnt_a"), col("cnt_b"), col("kl_micro").as("kl")), topN).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.term").as("term"), col("t.cnt_a").as("cnt_a"),
        col("t.cnt_b").as("cnt_b"), col("t.kl").as("kl_micro"))
  }

  /** Persisted heavy-hitter synopsis: per-group CANDIDATE tables (the
    * exact per-group top-`nCandidates` terms — bounded-heap, so state is
    * nCandidates rows per group per partition) alongside the per-group
    * CMS counter sketches, in ONE corpus pass each. This is the missing
    * half of frequency sketching: CMS alone answers point queries but
    * cannot ENUMERATE the heavy hitters; a bounded candidate table per
    * group restores enumeration with the SpaceSaving-union guarantee —
    * any term whose corpus count exceeds the sum of the groups' n-th
    * candidate counts appears in some group's top-n, hence in the union
    * ([[heavyHitters]] reads sketch+candidate rows alone, never the
    * corpus).
    */
  def buildTermSynopsis(
      terms: DataFrame, groupCol: String, termCol: String, path: String,
      nCandidates: Int = 64, depth: Int = 4, width: Int = 256): Unit = {
    val t = terms.select(col(groupCol).as("grp"), col(termCol).as("term"))
    t.groupBy(col("grp"))
      .agg(graft.functions.CmsSketch.cms(col("term"), depth, width).as("sk"))
      .write.format("kv").option("path", s"$path/sketches")
      .mode("overwrite").save()
    t.groupBy(col("grp"), col("term")).agg(count(lit(1)).as("n"))
      .groupBy(col("grp"))
      .agg(graft.functions.BoundedTopK.topK(
        struct(col("n").cast("double").as("s"), col("term"), col("n")),
        nCandidates).as("top"))
      .select(col("grp"), explode(col("top")).as("t"))
      .select(col("grp"), col("t.term").as("term"), col("t.n").as("n"))
      .write.format("kv").option("path", s"$path/cands")
      .mode("overwrite").save()
  }

  /** Corpus-wide top-`k` heavy hitters from a [[buildTermSynopsis]]
    * synopsis ALONE — candidates union (≤ groups·nCandidates rows),
    * per-group sketches rolled up with the exact counter add, each
    * candidate scored by the min-of-depth estimate, top-k by
    * (estimate desc, term asc). CMS never under-counts, so a true heavy
    * hitter can only rank HIGHER than its exact count warrants — the
    * readout misses one only if it fell outside every group's candidate
    * table (the bound documented on the builder). At 100 TB the corpus
    * is touched zero times: the dashboards re-rank from kv rows.
    */
  def heavyHitters(
      spark: org.apache.spark.sql.SparkSession, path: String, k: Int,
      depth: Int = 4, width: Int = 256): DataFrame = {
    import graft.functions.{CmsSketch, Sketches}
    val cands = spark.read.format("kv").option("path", s"$path/cands").load()
      .select(col("term")).distinct()
    val merged = spark.read.format("kv").option("path", s"$path/sketches").load()
      .agg(CmsSketch.cmsMerge(col("sk"), depth, width).as("sk"))
    cands.crossJoin(broadcast(merged))
      .select(col("term"),
        CmsSketch.cmsEstimate(col("sk"),
          Sketches.stringHash64(col("term"), 0x9747b28cL),
          depth, width).as("cms_n"))
      .agg(graft.functions.BoundedTopK.topK(
        struct(col("cms_n").cast("double").as("s"), col("term"),
          col("cms_n")), k).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("t.term").as("term"), col("t.cms_n").as("cms_n"),
        (col("pos") + 1).cast("int").as("rnk"))
  }

  /** Truncated-Poisson(1) inverse-CDF thresholds on the 53-bit hash
    * lattice: t_k = ⌊P(X ≤ k)·2⁵³⌋ for k = 0..7 (P(X > 7) < 1e-7 —
    * the truncation is part of the deterministic contract). A draw's
    * weight is the COUNT of thresholds ≤ its 53-bit uniform — pure
    * integer comparisons, so both engines agree bit for bit (the
    * literals are shared with the oracle the way `opqSigns` is).
    */
  def poissonThresholds: Seq[Long] = {
    val eInv = math.exp(-1.0)
    var fact = 1.0
    var cdf = 0.0
    (0 to 7).map { k =>
      if (k > 0) fact *= k
      cdf += eInv / fact
      math.floor(cdf * 9007199254740992.0 /* 2^53 */).toLong
    }
  }

  /** Deterministic POISSON BOOTSTRAP confidence interval for a corpus
    * mean (Chamandy et al., "Estimating uncertainty for massive data
    * streams", Google TR 2012 — the bootstrap that works in one
    * distributed pass): replica r gives every row an independent-ish
    * Poisson(1) weight derived from splitmix64(splitmix64(id ⊕ seed)
    * ⊕ r) (integer threshold comparisons on the 53-bit lattice —
    * exactly replayable), each replica's weighted mean is an exact
    * integer micro-unit (BigInt floor division driver-side, the
    * [[graft.operators.LinearProbe]] Cramer discipline), and the CI is
    * the exact-rank [2.5%, 97.5%] band over the `replicas` means.
    *
    * Scale shape: the corpus explodes ×`replicas` BEFORE a map-side-
    * combining groupBy(r) — the shuffle carries ≤ replicas rows per
    * partition, the driver sees exactly `replicas`+1 bounded rows, and
    * nothing is ever windowed or collected at corpus size. At 100 TB
    * this is THE way to put an error bar on a corpus metric without
    * recomputing it: one pass, R≤256 aggregate rows.
    *
    * Returns one row: (n_docs, replicas, mean_micro, ci_lo_micro,
    * ci_hi_micro) — micro-units of the valueCol mean.
    */
  def bootstrapMeanCi(
      df: DataFrame, valueCol: String, idCol: String,
      replicas: Int = 64, seed: Long = 7L): DataFrame = {
    // a mean IS a ratio with denominator 1: Σw·x / Σw·1
    val base = df.select(col(idCol).cast("long").as("id"),
      col(valueCol).cast("long").as("num"), lit(1L).as("den"))
    val (n, full, lo, hi) = bootstrapCore(base, replicas, seed)
    df.sparkSession.range(1).select(
      lit(n).as("n_docs"), lit(replicas).as("replicas"),
      lit(full).as("mean_micro"),
      lit(lo).as("ci_lo_micro"), lit(hi).as("ci_hi_micro"))
  }

  /** [[bootstrapMeanCi]] for RATIO metrics (dedup rate, filter
    * pass-rate, kept-token fraction): per replica the exact integer
    * micro-ratio 10⁶·Σw·num // Σw·den under the SAME deterministic
    * Poisson weights — numerator and denominator of one replica move
    * together, which is the whole point (independent resampling of
    * the two would fabricate variance a paired statistic doesn't
    * have). Same one-pass shape, same exact-rank band.
    */
  def bootstrapRatioCi(
      df: DataFrame, numCol: String, denCol: String, idCol: String,
      replicas: Int = 64, seed: Long = 7L): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
      col(numCol).cast("long").as("num"), col(denCol).cast("long").as("den"))
    val (n, full, lo, hi) = bootstrapCore(base, replicas, seed)
    df.sparkSession.range(1).select(
      lit(n).as("n_docs"), lit(replicas).as("replicas"),
      lit(full).as("ratio_micro"),
      lit(lo).as("ci_lo_micro"), lit(hi).as("ci_hi_micro"))
  }

  /** Per-GROUP bootstrap means under ONE shared replica plan: every
    * row's weight in replica r is the same function of (id, r)
    * regardless of group, so per-group CIs are COMPARABLE (two groups'
    * replica-r means saw the same resampling draw — the right design
    * for "is language A's mean above language B's" questions). One
    * map-side-combining groupBy(group, r); the driver sees
    * groups×replicas bounded rows (require-guarded).
    *
    * Returns one row per group: (group, n_docs, mean_micro,
    * ci_lo_micro, ci_hi_micro), ordered by group.
    */
  def bootstrapGroupMeanCi(
      df: DataFrame, groupCol: String, valueCol: String, idCol: String,
      replicas: Int = 64, seed: Long = 7L, maxGroups: Int = 64): DataFrame = {
    require(replicas >= 4 && replicas <= 256,
      s"replicas must be in [4, 256], got $replicas")
    require(maxGroups >= 1 && maxGroups <= 1024,
      s"maxGroups must be in [1, 1024], got $maxGroups")
    val spark = df.sparkSession
    val thresholds = poissonThresholds
    val base = df.select(col(groupCol).cast("string").as("g"),
      col(idCol).cast("long").as("id"), col(valueCol).cast("long").as("x"))
    val full = base.groupBy(col("g"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n")).collect()
    require(full.length <= maxGroups,
      s"${full.length} groups exceed the bounded driver budget " +
        s"($maxGroups) — raise maxGroups or pre-aggregate")
    val hu = shiftrightunsigned(graft.functions.Sketches.splitmixLong(
      graft.functions.Sketches.splitmixLong(
        col("id").bitwiseXOR(lit(seed))).bitwiseXOR(col("r"))), 11)
    val w = size(filter(typedLit(thresholds), t => hu >= t))
    val rep = base
      .select(col("g"), col("id"), col("x"),
        explode(sequence(lit(0L), lit(replicas - 1L))).as("r"))
      .select(col("g"), col("r"), w.cast("long").as("w"), col("x"))
      .groupBy(col("g"), col("r"))
      .agg(sum(col("w")).as("sw"), sum(col("w") * col("x")).as("swx"))
      .collect()
    val byGroup = rep.groupBy(_.getAs[String]("g"))
    val rows = full.sortBy(_.getAs[String]("g")).map { f =>
      val g = f.getAs[String]("g")
      val reps = byGroup.getOrElse(g, Array.empty)
      require(reps.length == replicas,
        s"group $g: expected $replicas replica rows, got ${reps.length}")
      val means = reps.map { r =>
        val sw = r.getAs[Long]("sw")
        require(sw > 0, s"group $g replica ${r.getAs[Long]("r")} drew zero weight")
        (BigInt(1000000) * BigInt(r.getAs[Long]("swx")) / BigInt(sw)).toLong
      }.sorted
      val loIdx = math.max(1, (replicas * 25 + 999) / 1000)
      val hiIdx = replicas + 1 - loIdx
      val meanMicro = (BigInt(1000000) * BigInt(f.getAs[Long]("sx")) /
        BigInt(f.getAs[Long]("n"))).toLong
      Row(g, f.getAs[Long]("n"), meanMicro,
        means(loIdx - 1), means(hiIdx - 1))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("grp", StringType, nullable = true),
        StructField("n_docs", LongType, nullable = false),
        StructField("mean_micro", LongType, nullable = false),
        StructField("ci_lo_micro", LongType, nullable = false),
        StructField("ci_hi_micro", LongType, nullable = false))))
  }

  /** The shared bootstrap machine over (id, num, den) rows: full-sample
    * micro-ratio, plus the exact-rank CI band over the replica
    * micro-ratios. All divisions are BigInt floors over bounded
    * driver-side aggregates; a replica whose denominator draws zero
    * weight fails loudly.
    */
  private def bootstrapCore(base: DataFrame, replicas: Int,
      seed: Long): (Long, Long, Long, Long) = {
    require(replicas >= 4 && replicas <= 256,
      s"replicas must be in [4, 256], got $replicas")
    val thresholds = poissonThresholds
    val full = base.agg(sum(col("num")).as("sn"), sum(col("den")).as("sd"),
      count(lit(1)).as("n")).collect()(0)
    val (sn, sd, n) = (full.getAs[Long]("sn"), full.getAs[Long]("sd"),
      full.getAs[Long]("n"))
    require(n > 0, "bootstrap CI needs a non-empty corpus")
    require(sd > 0, "bootstrap CI needs a positive total denominator")
    // per-replica Poisson weights: hu = splitmix(splitmix(id ⊕ seed) ⊕ r) >>> 11
    val hu = shiftrightunsigned(graft.functions.Sketches.splitmixLong(
      graft.functions.Sketches.splitmixLong(
        col("id").bitwiseXOR(lit(seed))).bitwiseXOR(col("r"))), 11)
    val w = size(filter(typedLit(thresholds), t => hu >= t))
    val rep = base
      .select(col("id"), col("num"), col("den"),
        explode(sequence(lit(0L), lit(replicas - 1L))).as("r"))
      .select(col("r"), w.cast("long").as("w"), col("num"), col("den"))
      .groupBy(col("r"))
      .agg(sum(col("w") * col("num")).as("swn"),
        sum(col("w") * col("den")).as("swd"))
      .collect()
    require(rep.length == replicas, s"expected $replicas replica rows")
    val ratios = rep.map { r =>
      val swd = r.getAs[Long]("swd")
      require(swd > 0,
        s"replica ${r.getAs[Long]("r")} drew zero total denominator weight")
      (BigInt(1000000) * BigInt(r.getAs[Long]("swn")) / BigInt(swd)).toLong
    }.sorted
    val loIdx = math.max(1, (replicas * 25 + 999) / 1000)
    val hiIdx = replicas + 1 - loIdx
    val fullMicro = (BigInt(1000000) * BigInt(sn) / BigInt(sd)).toLong
    (n, fullMicro, ratios(loIdx - 1), ratios(hiIdx - 1))
  }
}
