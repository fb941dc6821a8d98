package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curation, Dedup}
import graft.functions.TextFunctions

/** Gate entries for the corpus-curation operators ([[Curation]] +
  * [[Dedup.semantic]] + the sampling/mining extensions): repetition
  * quality signals, PII scrubbing, sequence packing, the auditable
  * Gopher filter, unigram surprisal, stratified + mixture sampling,
  * SemDeDup, and contrastive hard-negative mining. Every entry has an
  * exact DuckDB oracle — the hash-ordered samples replay splitmix64 via
  * [[SketchOracleSql.splitmixBigintSql]] / IEEE-exact integer
  * thresholds, SemDeDup replays the full deterministic k-means chain.
  */
object CurationQueries {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gopher-style repetition signals over the documents corpus.
    "q_doc_repetition" -> ((s, dir) => {
      Curation.repetitionSignals(Tables.load(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // PII scrub over a deterministically PII-augmented text column (the
    // fixture corpus is synthetic word soup with no PII — the augmentation
    // is part of the query, computed identically by the oracle, so the
    // detector/redactor runs against real positives).
    "q_doc_pii_scrub" -> ((s, dir) => {
      val aug = Tables.load(s, dir, "documents")
        .select(col("doc_id"), concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com from 10."), (col("doc_id") % 200).cast("string"),
          lit(".0.1 or call 555-123-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
      Curation.scrubPii(aug, "text")
        .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
          md5(col("text")).as("redacted_md5"))
        .orderBy(col("doc_id"))
    }),

    // Concat-and-chunk packing of the corpus into 2048-token training
    // sequences across 8 shards.
    "q_pack_sequences" -> ((s, dir) => {
      Curation.packSequences(Tables.load(s, dir, "documents"), "doc_id",
        TextFunctions.tokenCount(col("text")), capacity = 2048, shards = 8)
        .orderBy(col("doc_id"))
    }),

    // The dataloader view of the packing: per (shard, sequence) doc count
    // and token fill — every non-tail sequence is exactly full.
    "q_pack_manifest" -> ((s, dir) => {
      Curation.packManifest(Tables.load(s, dir, "documents"), "doc_id",
        TextFunctions.tokenCount(col("text")), capacity = 2048, shards = 8)
        .orderBy(col("shard"), col("seq"))
    }),

    // Deterministic 10-per-source uniform sample (largest splitmix64(id)
    // per group, bounded-heap state).
    "q_sample_stratified" -> ((s, dir) => {
      Curation.sampleByGroup(
        Tables.load(s, dir, "documents").select(col("source"), col("doc_id")),
        "source", "doc_id", k = 10)
        .orderBy(col("source"), col("doc_id"))
    }),

    // Auditable composite filter: per-doc pass flag + the names of every
    // failed rule (why the corpus shrank, not just how much).
    "q_doc_gopher" -> ((s, dir) => {
      Curation.gopherFilter(Tables.load(s, dir, "documents"), "text", "doc_id",
        minWords = 40)
        .select(col("doc_id"), col("passed"), col("reasons"))
        .orderBy(col("doc_id"))
    }),

    // Perplexity-family quality scoring: per-doc mean unigram surprisal
    // under the corpus's own word distribution.
    "q_doc_surprisal" -> ((s, dir) => {
      Curation.unigramSurprisal(Tables.load(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Mixture-weighted Bernoulli thinning: each source keeps a
    // deterministic hash-selected fraction (rate cycles 0.25/0.5/0.75/1.0
    // by source number) — the dataset-mixing primitive, replayed exactly
    // by the oracle via the same integer threshold compare.
    "q_sample_mixture" -> ((s, dir) => {
      val rate = ((substring(col("source"), 4, 10).cast("int") % 4) + 1)
        .cast("double") / 4.0
      Curation.sampleMixture(
        Tables.load(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", rate)
        .orderBy(col("doc_id"))
    }),

    // Snapshot diff between two derived corpus versions: v1 drops every
    // 7th doc and prefixes every 5th's text (→ changed); v2 drops every
    // 11th. added = %7-only, removed = %11-only, changed = %5 survivors.
    "q_corpus_diff" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val v1 = docs.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 5 === 0, concat(lit("OLD "), col("text")))
            .otherwise(col("text")))
      val v2 = docs.filter(col("doc_id") % 11 =!= 0)
      graft.operators.Curation.snapshotDiff(v1, v2, "doc_id", "text")
        .orderBy(col("id"))
    }),

    // Unigram distribution drift (release audit): English docs vs the
    // rest of the corpus — Laplace-smoothed union-vocabulary term
    // probabilities, pointwise KL(A||B) per term in integer micro-nats,
    // top-40 positive drivers. One ln per term type; every float step
    // (including the smoothing denominators) replays in the oracle.
    "q_corpus_drift" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      graft.operators.CorpusStats.unigramDrift(
        docs.filter(col("lang") === "en"), docs.filter(col("lang") =!= "en"),
        "text", topN = 40)
        .orderBy(col("kl_micro").desc, col("term"))
    }),

    // Deterministic train/val/test split assignment: every doc lands in
    // exactly one named split by an integer threshold compare on
    // splitmix64(doc_id ^ seed) — stable under corpus growth, replayed
    // exactly by the oracle's compare chain.
    "q_doc_split" -> ((s, dir) => {
      Curation.assignSplits(
        Tables.load(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 42L)
        .orderBy(col("doc_id"))
    }),

    // GROUP-keyed (leakage-safe) splits: hashing the SOURCE instead of
    // the doc id puts every document of a domain in the same split — the
    // contamination-safe eval-split discipline (a near-duplicate pair
    // within one crawl domain can never straddle train/test). Same
    // operator, string key; oracle replays the string hash.
    "q_doc_split_grouped" -> ((s, dir) => {
      val split = Curation.assignSplits(
        Tables.load(s, dir, "documents").select(col("doc_id"), col("source")),
        "source", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 42L)
      split.orderBy(col("doc_id"))
    }),

    // Temperature-based language rebalancing (the XLM-R / mC4 recipe):
    // sampled class shares ∝ n_c^0.7 at an overall ~0.5 kept fraction —
    // head languages thinned, tail boosted. The rate derivation
    // (quantized pow, integer normalizer, fixed op order) replays
    // exactly in the oracle.
    "q_sample_temperature" -> ((s, dir) => {
      Curation.temperatureSample(
        Tables.load(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id", alpha = 0.7, targetFraction = 0.5)
        .select(col("doc_id"), col("lang"), col("keep_rate"))
        .orderBy(col("doc_id"))
    }),

    // Token-budget subsample: documents in splitmix64 hash order until
    // the running token total passes the budget — "take N tokens from
    // the corpus", the pretraining-mixture primitive. Oracle replays
    // the hash order and the integer running sum verbatim.
    "q_sample_token_budget" -> ((s, dir) => {
      Curation.tokenBudget(
        Tables.load(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", size(split(col("text"), " ")), budget = 20000L)
        .orderBy(col("doc_id"))
    }),

    // Per-domain token budgets (the mixture builder): each source keeps
    // its hash-order document prefix until ITS budget (400/800/1200
    // tokens, cycling by source number) — oracle replays the per-group
    // window sum verbatim.
    "q_sample_domain_budget" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val budget = (((substring(col("source"), 4, 10).cast("int") % 3) + 1) * 400).cast("long")
      Curation.tokenBudgetByGroup(
        docs.select(col("source"), col("doc_id"), col("text")),
        "source", "doc_id", size(split(col("text"), " ")), budget)
        .orderBy(col("doc_id"))
    }),

    // DoReMi-style mixture reweighting: per-language mean doc length as
    // the loss proxy, global mean as the reference, 5 integer
    // multiplicative-weights rounds — domains whose loss exceeds the
    // reference gain share. The oracle unrolls every round.
    "q_mixture_reweight" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("lang"), TextFunctions.tokenCount(col("text")).as("nt"))
      val per = d.groupBy(col("lang"))
        .agg(expr("sum(nt) * 1000000 DIV count(*)").as("loss_micro"))
      val ref = d.agg(expr("sum(nt) * 1000000 DIV count(*)").as("ref_micro"))
      Curation.mixtureReweight(per.crossJoin(broadcast(ref)), "lang",
        "loss_micro", "ref_micro", rounds = 5, etaMilli = 200)
        .orderBy(col("domain"))
    }),

    // Temperature rebalancing feeding per-language token budgets in one
    // Catalyst plan — the "flatten the language head, then cap each
    // language's tokens" mixture recipe. Oracle chains the quantized-pow
    // rate replay into the window-sum budget replay.
    "q_pipeline_temperature" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      val kept = Curation.temperatureSample(docs, "lang", "doc_id",
        alpha = 0.7, targetFraction = 0.5)
      Curation.tokenBudgetByGroup(
        kept.select(col("lang"), col("doc_id"), col("text")),
        "lang", "doc_id", size(split(col("text"), " ")),
        when(col("lang") === "en", 3000L).otherwise(lit(1500L)))
        .orderBy(col("doc_id"))
    }),

    // Memorization-audit chart (Lee et al. 2022 family): the most
    // widely duplicated word 3-grams across the corpus — the report a
    // span-dedup run starts from. Bounded-heap top-40 by document
    // frequency; the per-doc DISTINCT shingle semantics replay exactly.
    "q_doc_top_ngrams" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(explode(TextFunctions.shingles(col("text"), 3)).as("ngram"))
        .where(col("ngram") =!= "")
        .groupBy(col("ngram")).agg(count(lit(1)).as("n_docs"))
        .where(col("n_docs") >= 2L)
        .agg(graft.functions.BoundedTopK.topK(
          struct(col("n_docs").cast("double").as("s"), col("ngram"),
            col("n_docs").as("nd")), 40).as("top"))
        .select(explode(col("top")).as("t"))
        .select(col("t.ngram").as("ngram"), col("t.nd").as("n_docs"))
        .orderBy(col("n_docs").desc, col("ngram"))
    }),

    // Count-Min frequency sketch (Cormode & Muthukrishnan 2005) over
    // the corpus vocabulary — the heavy-hitter audit at sketch cost:
    // ONE depth×width counter table (map-side combined, fixed state —
    // an exact GROUP BY term shuffles every distinct term at 100 TB),
    // then the top-12 exact terms ride along so the gate PINS the
    // measured over-count (CMS never under-counts). Item hashes, row
    // scrambles, bucket masks, exact counter sums and the min-of-depth
    // estimates all replay in the oracle.
    "q_doc_cms_tokens" -> ((s, dir) => {
      import graft.functions.{CmsSketch, Sketches}
      val toks = Tables.load(s, dir, "documents")
        .select(explode(
          graft.functions.WhitespaceTokens.wsTokens(col("text"))).as("term"))
      val sketch = toks.agg(
        CmsSketch.cms(col("term"), depth = 4, width = 256).as("sk"))
      val top = toks.groupBy(col("term")).agg(count(lit(1)).as("n"))
        .agg(graft.functions.BoundedTopK.topK(
          struct(col("n").cast("double").as("s"), col("term"),
            col("n").as("cnt")), 12).as("top"))
        .select(explode(col("top")).as("t"))
        .select(col("t.term").as("term"), col("t.cnt").as("exact_n"))
      top.crossJoin(broadcast(sketch))
        .select(col("term"),
          CmsSketch.cmsEstimate(col("sk"),
            Sketches.stringHash64(col("term"), 0x9747b28cL),
            depth = 4, width = 256).as("cms_n"),
          col("exact_n"))
        .orderBy(col("exact_n").desc, col("term"))
    }),

    // PERSISTED frequency-sketch table + rollup (the q_corpus_hll_merge
    // pattern on counters): per-source token sketches land once as a
    // kv table (array<long> counter blobs); the corpus-wide sketch is
    // their element-wise SUM — associative exact integers, so the
    // rollup is BIT-IDENTICAL to the direct sketch and the gate shares
    // the direct oracle (any merge divergence fails the compare).
    // Heavy-hitter ENUMERATION from persisted synopsis rows alone:
    // per-source candidate tables + CMS sketches built in one pass each,
    // then the corpus-wide top-15 re-ranked from kv rows only (candidate
    // union → rolled-up sketch → min-of-depth estimates). Exact counts
    // ride along to pin never-undercount: cms_n >= exact_n, every row.
    "q_doc_cms_heavy" -> ((s, dir) => {
      val syn = s"/tmp/graft_cmshh${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      graft.sources.ParquetIO.deletePath(syn)
      val toks = Tables.load(s, dir, "documents")
        .select(col("source"), explode(
          graft.functions.WhitespaceTokens.wsTokens(col("text"))).as("term"))
      graft.operators.CorpusStats.buildTermSynopsis(
        toks, "source", "term", syn, nCandidates = 24)
      val hh = graft.operators.CorpusStats.heavyHitters(s, syn, k = 15)
      val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("exact_n"))
      exact.join(broadcast(hh), Seq("term"))
        .select(col("term"), col("cms_n"), col("exact_n"), col("rnk"))
        .orderBy(col("rnk"))
    }),

    "q_doc_cms_merge" -> ((s, dir) => {
      import graft.functions.{CmsSketch, Sketches}
      val sk = s"/tmp/graft_cmssk${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      graft.sources.ParquetIO.deletePath(sk)
      val toks = Tables.load(s, dir, "documents")
        .select(col("source"), explode(
          graft.functions.WhitespaceTokens.wsTokens(col("text"))).as("term"))
      toks.groupBy(col("source"))
        .agg(CmsSketch.cms(col("term"), depth = 4, width = 256).as("sk"))
        .write.format("kv").option("path", sk).mode("overwrite").save()
      val merged = s.read.format("kv").option("path", sk).load()
        .agg(CmsSketch.cmsMerge(col("sk"), depth = 4, width = 256).as("sk"))
      val top = toks.groupBy(col("term")).agg(count(lit(1)).as("n"))
        .agg(graft.functions.BoundedTopK.topK(
          struct(col("n").cast("double").as("s"), col("term"),
            col("n").as("cnt")), 12).as("top"))
        .select(explode(col("top")).as("t"))
        .select(col("t.term").as("term"), col("t.cnt").as("exact_n"))
      top.crossJoin(broadcast(merged))
        .select(col("term"),
          CmsSketch.cmsEstimate(col("sk"),
            Sketches.stringHash64(col("term"), 0x9747b28cL),
            depth = 4, width = 256).as("cms_n"),
          col("exact_n"))
        .orderBy(col("exact_n").desc, col("term"))
    }),

    // The CMS cell grid under the 2-D marginalization discipline
    // (completing the matrix story across all four sketch families:
    // samples, KLL, HLL, now counters): per-(source × lang) term-count
    // sketches marginalize by counter ADDITION over either dimension —
    // per-lang term frequencies, per-source, and corpus-wide, all from
    // stored counter rows alone. Probes are the 8 globally-heaviest
    // terms; per-slice exact counts ride along (LEFT-joined so a probe
    // term absent from a slice pins at 0 — the never-under-count
    // invariant holds per slice).
    "q_doc_cms_matrix" -> ((s, dir) => {
      import graft.functions.{CmsSketch, Sketches}
      val sk = s"/tmp/graft_cmsmx${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      graft.sources.ParquetIO.deletePath(sk)
      val toks = Tables.load(s, dir, "documents")
        .select(col("source"), col("lang"), explode(
          graft.functions.WhitespaceTokens.wsTokens(col("text"))).as("term"))
      toks.groupBy(col("source"), col("lang"))
        .agg(CmsSketch.cms(col("term"), depth = 4, width = 256).as("sk"))
        .write.format("kv").option("path", sk).mode("overwrite").save()
      val stored = s.read.format("kv").option("path", sk).load()
      val probes = toks.groupBy(col("term")).agg(count(lit(1)).as("n"))
        .agg(graft.functions.BoundedTopK.topK(
          struct(col("n").cast("double").as("s"), col("term"),
            col("n").as("cnt")), 8).as("top"))
        .select(explode(col("top")).as("t"))
        .select(col("t.term").as("term"))
      def axisDf(axisName: String, keep: Seq[String]) = {
        val merged = stored.groupBy(keep.map(col): _*)
          .agg(CmsSketch.cmsMerge(col("sk"), depth = 4, width = 256)
            .as("sk"))
        val grp = if (keep.isEmpty) lit("*")
          else concat_ws("/", keep.map(c => col(c).cast("string")): _*)
        val est = merged.crossJoin(broadcast(probes))
          .select(keep.map(col) ++ Seq(grp.as("grp"), col("term"),
            CmsSketch.cmsEstimate(col("sk"),
              Sketches.stringHash64(col("term"), 0x9747b28cL),
              depth = 4, width = 256).as("cms_n")): _*)
        val exact = toks.join(broadcast(probes), "term")
          .groupBy(keep.map(col) :+ col("term"): _*)
          .agg(count(lit(1)).as("exact_n"))
        est.join(exact, keep :+ "term", "left")
          .na.fill(0L, Seq("exact_n"))
          .select(lit(axisName).as("axis"), col("grp"), col("term"),
            col("cms_n"), col("exact_n"))
      }
      axisDf("lang", Seq("lang"))
        .unionAll(axisDf("source", Seq("source")))
        .unionAll(axisDf("global", Seq.empty))
        .orderBy(col("axis"), col("grp"), col("term"))
    }),

    // Weighted per-source sampling without replacement (A-ES keys):
    // keep 5 docs per source at random but ∝-favoring length (weight
    // n_chars+1) — the quality-weighted downsampling primitive. The
    // hash-u draw, ln(u)/w key, micro quantization, and id-asc ties all
    // replay in the oracle.
    "q_sample_weighted" -> ((s, dir) => {
      Curation.sampleWeightedByGroup(
        Tables.load(s, dir, "documents")
          .select(col("source"), col("doc_id"), col("n_chars")),
        "source", "doc_id", col("n_chars") + lit(1L), k = 5, seed = 7L)
        .orderBy(col("source"), col("doc_id"))
    }),

    // Mergeable bottom-k sample — the sketch-matrix discipline applied
    // to SAMPLING ([[graft.operators.SampleSynopsis]]): the k docs with
    // the smallest unsigned splitmix64(doc_id) are a uniform-without-
    // replacement sample that is a pure function of the row SET —
    // reproducible on retry, map-side-partial (k rows per partition
    // shuffle, never the corpus), and rank-replayed by the oracle.
    "q_sample_bottomk" -> ((s, dir) => {
      graft.operators.SampleSynopsis.uniform(
        Tables.load(s, dir, "documents"), "doc_id", 64,
        Seq("doc_id", "source", "n_chars"))
        .select(col("rnk"), col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("rnk"))
    }),

    // PERSISTED per-source sample tables + rollup — the
    // q_corpus_kmv_merge discipline on SAMPLES: per-source bottom-64
    // rows (with their stored hash) land ONCE as a kv table; the
    // corpus-wide sample is re-aggregated from sample rows alone, and
    // is BIT-IDENTICAL to the direct build (any row of the global
    // bottom-k is in its own source's bottom-k). The direct sample
    // rides along; the oracle replays one chain and pins both columns.
    "q_sample_bottomk_merge" -> ((s, dir) => {
      import graft.operators.SampleSynopsis
      val sk = s"/tmp/graft_smpmg${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      graft.sources.ParquetIO.deletePath(sk)
      val docs = Tables.load(s, dir, "documents")
      docs.groupBy(col("source"))
        .agg(SampleSynopsis.uniformAgg(col("doc_id"), 64,
          "doc_id" -> col("doc_id"), "n_chars" -> col("n_chars")).as("smp"))
        .select(col("source"), posexplode(col("smp")).as(Seq("pos", "t")))
        .select(col("source"), col("t.h").as("h"),
          col("t.doc_id").as("doc_id"), col("t.n_chars").as("n_chars"))
        .write.format("kv").option("path", sk).mode("overwrite").save()
      val merged = SampleSynopsis.rollup(
        s.read.format("kv").option("path", sk).load(), "h", 64,
        Seq("doc_id", "n_chars"))
      val direct = SampleSynopsis.uniform(docs, "doc_id", 64, Seq("doc_id"))
        .select(col("rnk"), col("doc_id").as("doc_id_direct"))
      merged.join(direct, "rnk")
        .select(col("rnk"), col("doc_id"), col("doc_id_direct"),
          col("n_chars"))
        .orderBy(col("rnk"))
    }),

    // Sample MAINTENANCE under append — the streaming-index discipline
    // on the sample synopsis: day-1's sample rows persist, day-2's
    // batch appends ITS OWN bottom-64 rows to the same table (no
    // rebuild, no day-1 re-scan), and the read-side rollup still equals
    // the direct sample of the full corpus BIT-FOR-BIT (union+trim
    // confluence — same lemma, applied incrementally). Shares the
    // merge gate's oracle: one replayed chain pins both columns.
    "q_sample_incremental" -> ((s, dir) => {
      import graft.operators.SampleSynopsis
      val sk = s"/tmp/graft_smpinc${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      graft.sources.ParquetIO.deletePath(sk)
      val docs = Tables.load(s, dir, "documents")
      def sampleRows(batch: org.apache.spark.sql.DataFrame) =
        SampleSynopsis.uniform(batch, "doc_id", 64,
          Seq("doc_id", "n_chars"))
          .select(col("h"), col("doc_id"), col("n_chars"))
      sampleRows(docs.filter(col("doc_id") % 2 === 0))
        .write.format("kv").option("path", sk).mode("overwrite").save()
      sampleRows(docs.filter(col("doc_id") % 2 === 1))
        .write.format("kv").option("path", sk).mode("append").save()
      val merged = SampleSynopsis.rollup(
        s.read.format("kv").option("path", sk).load(), "h", 64,
        Seq("doc_id", "n_chars"))
      val direct = SampleSynopsis.uniform(docs, "doc_id", 64, Seq("doc_id"))
        .select(col("rnk"), col("doc_id").as("doc_id_direct"))
      merged.join(direct, "rnk")
        .select(col("rnk"), col("doc_id"), col("doc_id_direct"),
          col("n_chars"))
        .orderBy(col("rnk"))
    }),

    // DLT priority sampling (Duffield–Lund–Thorup JACM'07): weights =
    // n_chars, priorities q = w/u on the exact 2^53 integer lattice,
    // top-32 by priority, and the τ-threshold estimator reads the
    // corpus's TOTAL character count off the 32-row sample — the
    // "estimate the release size from a tiny weighted sample" query.
    // Exact total rides along; every term replays in HUGEINT.
    "q_sample_priority_weighted" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .filter(col("n_chars") > 0)
      val exact = docs.agg(sum(col("n_chars")).cast("long")
        .as("exact_total"))
      graft.operators.SampleSynopsis.weighted(docs, "doc_id", "n_chars", 32)
        .crossJoin(broadcast(exact))
        .select(col("rnk"), col("id").as("doc_id"),
          col("w").as("n_chars"), col("est_total"), col("exact_total"))
        .orderBy(col("rnk"))
    }),

    // The WEIGHTED sample joins the maintenance matrix
    // (q_sample_bottomk_merge's discipline on DLT priority samples):
    // per-source top-33 priority rows persist ONCE — 33 = k+1 ranks so
    // the estimator's τ survives rollup exactly — and the corpus-wide
    // weighted sample re-aggregates from sample rows alone,
    // BIT-IDENTICAL to the direct build (priorities are a pure
    // function of (id, w), so the subset-rank lemma holds in priority
    // order). The τ-threshold total-character estimate computed from
    // the ROLLED-UP rows equals the direct estimate to the integer;
    // exact total rides along. One replayed chain pins every column.
    "q_sample_priority_merge" -> ((s, dir) => {
      import graft.operators.SampleSynopsis
      val sk = s"/tmp/graft_priomg${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      graft.sources.ParquetIO.deletePath(sk)
      val docs = Tables.load(s, dir, "documents").filter(col("n_chars") > 0)
      SampleSynopsis.explodePriority(
        docs.groupBy(col("source"))
          .agg(SampleSynopsis.priorityAgg(col("doc_id"), col("n_chars"), 33)
            .as("smp")),
        "smp", Seq("source"))
        .select(col("source"), col("nq"), col("id"), col("w"))
        .write.format("kv").option("path", sk).mode("overwrite").save()
      val rolled = SampleSynopsis.rollupPriority(
        s.read.format("kv").option("path", sk).load(), 33)
      val est = SampleSynopsis.priorityEstimate(rolled, 32)
      val direct = SampleSynopsis.explodePriority(
        docs.agg(SampleSynopsis.priorityAgg(col("doc_id"), col("n_chars"), 33)
          .as("smp")), "smp", Seq.empty)
      val estDirect = SampleSynopsis.priorityEstimate(direct, 32)
        .select(col("est_total").as("est_total_direct"))
      val exact = docs.agg(sum(col("n_chars")).cast("long").as("exact_total"))
      rolled.filter(col("rnk") <= 32)
        .join(direct.select(col("rnk"), col("id").as("doc_id_direct")), "rnk")
        .crossJoin(broadcast(est)).crossJoin(broadcast(estDirect))
        .crossJoin(broadcast(exact))
        .select(col("rnk"), col("id").as("doc_id"),
          col("doc_id_direct"), col("w").as("n_chars"),
          col("est_total"), col("est_total_direct"), col("exact_total"))
        .orderBy(col("rnk"))
    }),

    // Sketch-PLANNED sampling: per-source keep-rates derive from the
    // PERSISTED HLL register table (n̂ per source — no exact count pass
    // anywhere), execution is a deterministic hash gate in ONE corpus
    // pass: keep a doc iff its unsigned splitmix64(doc_id⊕11) is below
    // ⌊quota·2^64/n̂⌋. At 100 TB the synopsis is already maintained
    // incrementally, so planning reads sketch rows alone; the sample
    // itself never shuffles (a filter, not a sort). Thresholds live on
    // the exact u64 lattice — every kept doc_id replays in HUGEINT.
    "q_sample_sketch_budget" -> ((s, dir) => {
      import graft.functions.{HllDistinct, HllMerge, PrioritySample, Sketches}
      val sk = s"/tmp/graft_skbud${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      graft.sources.ParquetIO.deletePath(sk)
      val docs = Tables.load(s, dir, "documents")
      docs.groupBy(col("source"))
        .agg(HllDistinct.hllRegisters(col("doc_id"), p = 8).as("regs"))
        .write.format("kv").option("path", sk).mode("overwrite").save()
      val plan = s.read.format("kv").option("path", sk).load()
        .select(col("source"), HllMerge.hllEstimate(col("regs"), 8).as("n_hat"))
        .withColumn("thr", PrioritySample.shl64Div(lit(6L), col("n_hat")))
      val h = Sketches.splitmixLong(col("doc_id").bitwiseXOR(lit(11L)))
      val two64 = lit(new java.math.BigDecimal("18446744073709551616"))
      docs.join(broadcast(plan), "source")
        .withColumn("hu", when(h < 0, h.cast("decimal(38,0)") + two64)
          .otherwise(h.cast("decimal(38,0)")))
        .where(col("hu") < col("thr"))
        .select(col("source"), col("doc_id"), col("n_hat"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // Release export + integrity manifest: 8 hash-assigned parquet
    // shards written in one pass; per shard (n_rows, n_tokens,
    // content_sig) where the signature is the order-free BIT_XOR of
    // per-row stringHash64(id || U+0001 || text) — shard assignment,
    // counts, and signature all replayed by the oracle.
    "q_export_manifest" -> ((s, dir) => {
      val safe = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val out = s"/tmp/graft_export$safe"
      graft.sources.ParquetIO.deletePath(out)
      Curation.exportShards(
        Tables.load(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", out, shards = 8, seed = 5L)
        .orderBy(col("shard"))
    }),

    // Unicode NFC normalization: every 7th doc gets a decomposed-accent
    // prefix ("Cafe" + combining U+0301) the normalizer must fold to the
    // composed form; NFC is standard-defined, so DuckDB's nfc_normalize
    // replays it byte-identically. Output: normalized text + changed flag.
    "q_doc_unicode_norm" -> ((s, dir) => {
      val aug = Tables.load(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(lit("Cafe\u0301 "), col("text"))).otherwise(col("text"))
          .as("text"))
      aug.select(col("doc_id"),
          graft.functions.UnicodeNfc.nfc(col("text")).as("norm_text"),
          (graft.functions.UnicodeNfc.nfc(col("text")) =!= col("text"))
            .as("changed"))
        .orderBy(col("doc_id"))
    }),

    // One-row dataset card: totals, exact duplicate-text rate, language
    // mix (count, dominant share, entropy in integer micro-nats) — the
    // release-notes summary, every value exactly replayed.
    "q_corpus_card" -> ((s, dir) => {
      graft.operators.CorpusStats.card(
        Tables.load(s, dir, "documents"), "text", "doc_id", "lang")
    }),

    // Content-defined chunking: gear rolling hash over code points, cut
    // where the low 5 bits clear — the storage-dedup segmentation whose
    // boundaries survive edits. The oracle recomputes every cut from the
    // mod-32 window identity (only the last 5 gear values can touch the
    // masked bits) and rebuilds the same chunks.
    "q_doc_cdc_chunks" -> ((s, dir) => {
      Curation.cdcChunkDocuments(
        Tables.load(s, dir, "documents"), "text", "doc_id", maskBits = 5)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // Vocabulary coverage / OOV rate: learn the top-20 vocabulary from
    // the corpus itself (the q_doc_vocab_topk machinery), then audit
    // per-doc coverage against it — the tokenizer-fit report. The oracle
    // replays the vocab cut (count desc, term asc) and both counters.
    "q_doc_vocab_coverage" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val vocab = Curation.topVocabulary(docs, "text", k = 20)
      Curation.vocabCoverage(docs, "text", "doc_id", vocab)
        .orderBy(col("doc_id"))
    }),

    // CCNet-style perplexity bucketing end to end: score every doc by
    // unigram surprisal, cut the corpus into head/middle/tail at the
    // exact binned 33/67 percentile thresholds (bounded-state quantiles,
    // broadcast back), then give each bucket its own token budget —
    // most tokens from the most-fluent head, a thinned tail. One
    // Catalyst plan; the oracle replays scoring, interpolated
    // thresholds, bucketing, and the per-bucket window-sum budgets.
    "q_pipeline_ccnet" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val scored = Curation.unigramSurprisal(docs, "text", "doc_id")
      val thr = graft.operators.CorpusStats.binnedQuantiles(
        scored.withColumn("__g", lit(1)), "__g", "surprisal",
        Seq(0.33, 0.67), binDecimals = 4)
        .select(col("q_33"), col("q_67"))
      val bucketed = scored.crossJoin(broadcast(thr))
        .withColumn("bucket",
          when(col("surprisal") <= col("q_33"), lit("head"))
            .when(col("surprisal") <= col("q_67"), lit("middle"))
            .otherwise(lit("tail")))
      Curation.tokenBudgetByGroup(
        bucketed.select(col("doc_id"), col("bucket"), col("n_tokens")),
        "bucket", "doc_id", col("n_tokens"),
        when(col("bucket") === "head", 6000L)
          .when(col("bucket") === "middle", 3000L).otherwise(lit(1500L)))
        .orderBy(col("doc_id"))
    }),

    // The mixture-building pipeline END TO END in one Catalyst plan:
    // per-language token budgets (hash-order prefixes) feed the stride
    // interleave — domain capping then weighted scheduling, the two
    // stages a real pretraining mix runs back to back. Oracle chains
    // both replays (window-sum budget → integer stride sort).
    "q_pipeline_mixture" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val budget = when(col("lang") === "en", 12000L).otherwise(4000L)
      val kept = Curation.tokenBudgetByGroup(
        docs.select(col("lang"), col("doc_id"), col("text")),
        "lang", "doc_id", size(split(col("text"), " ")), budget)
      Curation.interleaveMixture(
        kept.select(col("doc_id"), col("lang")),
        "lang", "doc_id",
        Seq(("en", 5L), ("zh", 3L), ("de", 2L), ("es", 2L), ("fr", 1L)),
        shards = 4, seed = 23L)
        .orderBy(col("doc_id"))
    }),

    // DSIR importance resampling: 50 documents drawn ∝ exp(hashed-bigram
    // log-likelihood ratio toward the src1–src3 "target domain") via
    // deterministic Gumbel top-k — the domain-targeted data-selection
    // step of a pretraining pipeline, replayed exactly by the oracle
    // (integer-quantized weights, splitmix-derived noise).
    "q_dsir_resample" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Curation.importanceResample(
        docs.select(col("doc_id"), col("text")),
        docs.filter(col("source").isin("src1", "src2", "src3")).select(col("text")),
        "text", "doc_id", k = 50)
        .orderBy(col("doc_id"))
    }),

    // Deterministic epoch shuffle: the corpus as a reproducible uniform
    // permutation (8 shards, per-epoch seed), materialized as
    // (shard, pos, global_pos) — oracle replays the seeded splitmix
    // order and both row_number layers verbatim.
    "q_doc_shuffle_shards" -> ((s, dir) => {
      Curation.shuffleShards(
        Tables.load(s, dir, "documents").select(col("doc_id")),
        "doc_id", shards = 8, seed = 17L)
        .orderBy(col("doc_id"))
    }),

    // Deterministic mixture interleave (stride scheduling): the five
    // language sub-corpora merged into one weighted training order —
    // engine computes every global position analytically (closed-form
    // integer rank, zero merge shuffles); the oracle SORTS by the
    // cross-multiplied integer stride key instead. Two formulations,
    // one schedule.
    "q_doc_interleave" -> ((s, dir) => {
      Curation.interleaveMixture(
        Tables.load(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id",
        Seq(("en", 5L), ("zh", 3L), ("de", 2L), ("es", 2L), ("fr", 1L)),
        shards = 8, seed = 11L)
        .orderBy(col("doc_id"))
    }),

    // Bigram-interpolated surprisal (CCNet-perplexity family): per-doc
    // mean of −ln(0.7·p(w|prev) + 0.3·p(w)) in integer micro-nats —
    // context-sensitive quality scoring the unigram gate cannot see.
    "q_doc_bigram_surprisal" -> ((s, dir) => {
      Curation.bigramSurprisal(Tables.load(s, dir, "documents"), "text", "doc_id",
        lambda = 0.7)
        .orderBy(col("doc_id"))
    }),

    // Overlapping token-window chunking (RAG prep): 64-token windows
    // every 48 tokens — row-local sequence+explode, zero shuffles.
    "q_doc_chunks" -> ((s, dir) => {
      Curation.chunkDocuments(Tables.load(s, dir, "documents"), "text", "doc_id",
        chunk = 64, stride = 48)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // Top-100 corpus vocabulary by frequency (count desc, term asc) via
    // the bounded heap — tokenizer-training support.
    "q_doc_vocab_topk" -> ((s, dir) => {
      Curation.topVocabulary(Tables.load(s, dir, "documents"), "text", k = 100)
        .orderBy(col("rnk"))
    }),

    // Interpolated Kneser-Ney bigram surprisal (the KenLM-family scorer):
    // absolute discounting + continuation backoff; the probability is an
    // integer rational (quarter-integer discount), so only one ln per
    // bigram type — replayed exactly by the oracle.
    "q_doc_kn_surprisal" -> ((s, dir) => {
      Curation.knSurprisal(Tables.load(s, dir, "documents"), "text", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Contrastive hard-negative mining: for each query embedding, the 5
    // most similar corpus vectors with a DIFFERENT label.
    "q_embed_hard_negatives" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      graft.operators.SimilaritySearch.hardNegatives(
        emb, emb.filter(col("vec_id") < 10), "embedding", "vec_id", "label", k = 5)
        .orderBy(col("qid"), col("rnk"))
    }),

    // SemDeDup over the embeddings corpus: same cell geometry as the IVF
    // gate (8 cells, cap-32 training), pairs at cosine >= 0.25.
    "q_dedup_semantic" -> ((s, dir) => {
      Dedup.semantic(Tables.load(s, dir, "embeddings"), "embedding", "vec_id",
        minCosine = 0.25, nCells = 8, maxTrainPerCell = 32)
        .orderBy(col("id_a"), col("id_b"))
    }),
  )

  def oracles: Map[String, String] = Map(
    // the 5 multiplicative-weights rounds unrolled; excess only computed
    // when loss > ref so integer division never sees a negative
    "q_mixture_reweight" -> {
      val wt = (1 to 5).foldLeft("CAST(1000000 AS BIGINT)") { (prev, _) =>
        s"(($prev) * (1000000 + 200 * ex)) // 1000000"
      }
      s"""WITH d AS (
         |  SELECT lang, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS nt
         |  FROM documents
         |), per AS (
         |  SELECT lang, CAST(sum(nt) AS BIGINT) * 1000000 // count(*) AS loss
         |  FROM d GROUP BY 1
         |), ref AS (
         |  SELECT CAST(sum(nt) AS BIGINT) * 1000000 // count(*) AS r FROM d
         |), e AS (
         |  SELECT lang, loss, CASE WHEN r <= 0 THEN 1000
         |    WHEN loss <= r THEN 0
         |    ELSE least(1000, (loss - r) * 1000 // r) END AS ex
         |  FROM per, ref
         |), w AS (
         |  SELECT lang, loss, ex, $wt AS wt FROM e
         |), t AS (SELECT sum(wt) AS total FROM w)
         |SELECT lang AS domain, CAST(loss AS BIGINT) AS loss_micro,
         |  CAST(ex AS BIGINT) AS excess_milli, CAST(wt AS BIGINT) AS weight_micro,
         |  CAST(wt * 1000000 // total AS BIGINT) AS share_micro
         |FROM w, t ORDER BY domain""".stripMargin
    },
    "q_dsir_resample" -> SketchOracleSql.dsirResampleOracle(
      k = 50, buckets = 1024, seed = 0x7a5a0d51e5a3b1c9L,
      targetPred = "source IN ('src1', 'src2', 'src3')"),

    "q_doc_repetition" ->
      """WITH perrow AS (
        |  SELECT doc_id, CAST(length(text) AS DOUBLE) AS n_chars,
        |    string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents
        |), tagged AS (
        |  SELECT doc_id, n,
        |    array_to_string(ws[i + 1 : i + n], ' ') AS gram
        |  FROM perrow, unnest([2, 3, 5]) AS tn(n),
        |    unnest(generate_series(0, len(ws) - n)) AS ti(i)
        |  WHERE len(ws) >= n
        |), counted AS (
        |  SELECT doc_id, n, gram, count(*) AS cnt,
        |    count(*) * length(gram) AS cl
        |  FROM tagged GROUP BY 1, 2, 3
        |), covered AS (
        |  SELECT doc_id,
        |    max(CASE WHEN n = 2 THEN cl END) AS top2_cl,
        |    max(CASE WHEN n = 3 THEN cl END) AS top3_cl,
        |    sum(CASE WHEN n = 5 AND cnt >= 2 THEN cl ELSE 0 END) AS dup5_cl
        |  FROM counted GROUP BY 1
        |)
        |SELECT p.doc_id, len(p.ws) AS n_words,
        |  round(1.0 - len(list_distinct(p.ws)) /
        |    greatest(CAST(len(p.ws) AS DOUBLE), 1.0), 4) AS word_rep,
        |  round(coalesce(c.top2_cl / p.n_chars, 0.0), 4) AS top2_frac,
        |  round(coalesce(c.top3_cl / p.n_chars, 0.0), 4) AS top3_frac,
        |  round(coalesce(c.dup5_cl / p.n_chars, 0.0), 4) AS dup5_frac
        |FROM perrow p LEFT JOIN covered c USING (doc_id)
        |ORDER BY p.doc_id""".stripMargin,

    "q_doc_pii_scrub" ->
      """WITH aug AS (
        |  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@mail.example.com from 10.' || CAST(doc_id % 200 AS VARCHAR)
        |    || '.0.1 or call 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    AS text
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(text, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g')) AS redacted_md5
        |FROM aug
        |ORDER BY doc_id""".stripMargin,

    "q_pack_sequences" ->
      """WITH toks AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents
        |), packed AS (
        |  SELECT doc_id, shard, n_tok,
        |    CAST(coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
        |  FROM toks
        |)
        |SELECT doc_id, shard, n_tok, tok_offset,
        |  CAST(tok_offset // 2048 AS BIGINT) AS begin_seq,
        |  CAST((tok_offset + greatest(n_tok, 1) - 1) // 2048 AS BIGINT) AS end_seq
        |FROM packed
        |ORDER BY doc_id""".stripMargin,

    "q_pack_manifest" ->
      """WITH toks AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents
        |), packed AS (
        |  SELECT doc_id, shard, n_tok,
        |    CAST(coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
        |  FROM toks
        |), spans AS (
        |  SELECT shard, tok_offset, n_tok, seq,
        |    least(tok_offset + n_tok, (seq + 1) * 2048) -
        |      greatest(tok_offset, seq * 2048) AS fill
        |  FROM packed, unnest(generate_series(tok_offset // 2048,
        |    (tok_offset + greatest(n_tok, 1) - 1) // 2048)) AS ts(seq)
        |)
        |SELECT shard, seq, count(*) AS n_docs,
        |  CAST(sum(fill) AS BIGINT) AS fill_tokens
        |FROM spans
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q_sample_stratified" -> {
      val hk = SketchOracleSql.splitmixBigintSql("doc_id")
      s"""SELECT source, doc_id FROM (
         |  SELECT source, doc_id,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY CAST($hk AS DOUBLE) DESC, doc_id) AS rn
         |  FROM documents
         |) WHERE rn <= 10
         |ORDER BY source, doc_id""".stripMargin
    },

    "q_dedup_semantic" -> SketchOracleSql.semanticDedupOracle,

    "q_doc_gopher" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS nw,
        |    length(regexp_replace(text, '\s+', '', 'g')) /
        |      greatest(CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE), 1.0) AS al,
        |    1.0 - len(list_distinct(string_split_regex(trim(text), '\s+'))) /
        |      greatest(CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE), 1.0) AS wr,
        |    CAST(len(regexp_extract_all(text, '[^\p{L}0-9\s]')) AS DOUBLE) /
        |      greatest(CAST(length(text) AS DOUBLE), 1.0) AS pr
        |  FROM documents
        |), r AS (
        |  SELECT doc_id,
        |    coalesce(array_to_string(list_filter([
        |      CASE WHEN nw < 40 THEN 'too_short' END,
        |      CASE WHEN nw > 100000 THEN 'too_long' END,
        |      CASE WHEN al < 3.0 THEN 'words_too_short' END,
        |      CASE WHEN al > 10.0 THEN 'words_too_long' END,
        |      CASE WHEN wr > 0.6 THEN 'too_repetitive' END,
        |      CASE WHEN pr > 0.3 THEN 'too_much_punct' END
        |    ], x -> x IS NOT NULL), ','), '') AS reasons
        |  FROM m
        |)
        |SELECT doc_id, reasons = '' AS passed, reasons
        |FROM r
        |ORDER BY doc_id""".stripMargin,

    "q_doc_surprisal" ->
      """WITH tokens AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents
        |), freq AS (
        |  SELECT term, count(*) AS cnt FROM tokens GROUP BY 1
        |), tot AS (SELECT sum(cnt) AS total FROM freq)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(avg(-ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))), 4) AS surprisal
        |FROM tokens JOIN freq USING (term) CROSS JOIN tot
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // per-doc DISTINCT 3-gram sets (short docs contribute their full
    // text as one partial gram — the shingles() contract), df >= 2,
    // top-40 by df desc / gram asc
    "q_doc_top_ngrams" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS words
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(0, greatest(len(words) - 3, 0)),
        |    i -> array_to_string(words[(i+1)::INT : (i+3)::INT], ' ')))) AS ngram
        |  FROM w
        |), c AS (
        |  SELECT ngram, count(*)::BIGINT AS n_docs FROM g
        |  WHERE ngram <> ''
        |  GROUP BY 1 HAVING count(*) >= 2
        |)
        |SELECT ngram, n_docs FROM (
        |  SELECT *, row_number() OVER (ORDER BY n_docs DESC, ngram) AS rn FROM c
        |) WHERE rn <= 40
        |ORDER BY n_docs DESC, ngram""".stripMargin,

    // u from the unsigned top-53 hash bits, ln(u)/(n_chars+1) key in
    // micro units, per-source top-5 by key desc / id asc
    "q_sample_weighted" -> {
      val hk = SketchOracleSql.splitmixBigintSql("xor(doc_id, 7::BIGINT)")
      s"""WITH keyed AS (
         |  SELECT source, doc_id,
         |    CAST(floor(1000000.0 * (ln(
         |      (((CASE WHEN ($hk) < 0
         |          THEN ($hk)::HUGEINT + 18446744073709551616::HUGEINT
         |          ELSE ($hk)::HUGEINT END) // 2048)::DOUBLE + 0.5)
         |        / 9007199254740992.0)
         |      / CAST(n_chars + 1 AS DOUBLE)) + 0.5) AS BIGINT) AS samp_key
         |  FROM documents
         |), r AS (
         |  SELECT source, doc_id, samp_key,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY CAST(samp_key AS DOUBLE) DESC, doc_id) AS rn
         |  FROM keyed
         |)
         |SELECT source, doc_id, samp_key FROM r WHERE rn <= 5
         |ORDER BY source, doc_id""".stripMargin
    },

    "q_sample_bottomk" -> SketchOracleSql.sampleBottomKOracle(64),
    "q_sample_bottomk_merge" -> SketchOracleSql.sampleBottomKMergeOracle(64),
    // incremental append maintenance is rollup ≡ direct by the same
    // union+trim lemma — shares the merge oracle
    "q_sample_incremental" -> SketchOracleSql.sampleBottomKMergeOracle(64),
    "q_sample_priority_weighted" ->
      SketchOracleSql.samplePriorityWeightedOracle(32),
    "q_sample_priority_merge" ->
      SketchOracleSql.samplePriorityMergeOracle(32),
    "q_sample_sketch_budget" -> SketchOracleSql.sampleSketchBudgetOracle(6),

    // shard = pmod(splitmix64(id ^ 5), 8); content_sig = bit_xor of the
    // full per-row string hash over id || chr(1) || text
    "q_export_manifest" -> {
      val hk = SketchOracleSql.splitmixBigintSql("xor(doc_id, 5::BIGINT)")
      val rh = SketchOracleSql.stringHash64BigintSql(
        "doc_id::VARCHAR || chr(1) || text", 5L)
      s"""SELECT shard, count(*)::BIGINT AS n_rows,
         |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
         |  bit_xor(rh) AS content_sig
         |FROM (
         |  SELECT CAST(((($hk) % 8) + 8) % 8 AS INT) AS shard,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |      w -> w <> '')) AS BIGINT) AS ntok,
         |    ($rh) AS rh
         |  FROM documents)
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // NFC is standard-defined: DuckDB's nfc_normalize must byte-match
    // java.text.Normalizer on the decomposed-accent augmentation
    "q_doc_unicode_norm" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN 'Cafe' || chr(769) || ' ' || text
        |         ELSE text END AS text
        |  FROM documents
        |)
        |SELECT doc_id, nfc_normalize(text) AS norm_text,
        |  nfc_normalize(text) <> text AS changed
        |FROM aug ORDER BY doc_id""".stripMargin,

    // the card's every value replayed: totals, md5-distinct dup rate,
    // language histogram (top by c desc / lang desc — the max-struct tie),
    // per-language entropy terms quantized before the integer sum
    "q_corpus_card" ->
      """WITH base AS (
        |  SELECT count(*)::BIGINT AS n_docs,
        |    CAST(sum(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      w -> w <> ''))) AS BIGINT) AS n_tokens,
        |    CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |    count(DISTINCT md5(text))::BIGINT AS n_unique
        |  FROM documents
        |), langs AS (
        |  SELECT lang, count(*)::BIGINT AS c FROM documents GROUP BY 1
        |), lt AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS t, count(*)::BIGINT AS nl FROM langs
        |), ent AS (
        |  SELECT CAST(sum(CAST(floor(1000000.0 *
        |      ((-(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))) *
        |       ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))) + 0.5) AS BIGINT))
        |    AS BIGINT) AS h
        |  FROM langs, lt
        |), top AS (
        |  SELECT lang AS top_lang, c AS top_n FROM langs
        |  ORDER BY c DESC, lang DESC LIMIT 1
        |)
        |SELECT n_docs, n_tokens, n_chars,
        |  round(1.0 - CAST(n_unique AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
        |    AS dup_rate,
        |  nl AS n_langs, top_lang,
        |  round(CAST(top_n AS DOUBLE) / CAST(t AS DOUBLE), 6) AS top_lang_share,
        |  h AS lang_entropy_micro
        |FROM base, lt, ent, top""".stripMargin,

    // gear-hash cut replay: h_i & 31 depends on only the last 5 gear
    // values (2^(i-j) ≡ 0 mod 32 beyond that), so each cut is a 5-term
    // windowed sum — no sequential fold needed
    "q_doc_cdc_chunks" -> {
      val sm = SketchOracleSql.splitmixBigintSql("CAST(ord(substr(text, i, 1)) AS BIGINT)")
      s"""WITH chars AS (
         |  SELECT doc_id, text, n, i,
         |    ((($sm) % 32) + 32) % 32 AS gm
         |  FROM (
         |    SELECT doc_id, text, length(text) AS n,
         |      unnest(generate_series(1, length(text))) AS i
         |    FROM documents WHERE length(text) > 0)
         |), cuts AS (
         |  SELECT a.doc_id, a.i
         |  FROM chars a JOIN chars b
         |    ON b.doc_id = a.doc_id AND b.i BETWEEN a.i - 4 AND a.i
         |  GROUP BY a.doc_id, a.i, a.n
         |  HAVING sum(b.gm * (1 << (a.i - b.i))) % 32 = 0 AND a.i < a.n
         |), starts AS (
         |  SELECT doc_id, 1 AS start FROM documents WHERE length(text) > 0
         |  UNION ALL
         |  SELECT doc_id, i + 1 AS start FROM cuts
         |), chunks AS (
         |  SELECT s.doc_id, s.start,
         |    coalesce((SELECT min(c.i) FROM cuts c
         |              WHERE c.doc_id = s.doc_id AND c.i >= s.start),
         |      (SELECT length(text) FROM documents d WHERE d.doc_id = s.doc_id))
         |      AS fin
         |  FROM starts s
         |)
         |SELECT c.doc_id,
         |  CAST(row_number() OVER (PARTITION BY c.doc_id ORDER BY c.start) - 1
         |    AS INT) AS chunk_idx,
         |  CAST(c.start AS INT) AS start,
         |  CAST(c.fin - c.start + 1 AS INT) AS len,
         |  substr(d.text, c.start, c.fin - c.start + 1) AS chunk_text
         |FROM chunks c JOIN documents d USING (doc_id)
         |ORDER BY doc_id, chunk_idx""".stripMargin
    },

    // vocab cut (count desc, term asc, rnk <= 20) + per-doc coverage
    // counters over the same whitespace token stream
    "q_doc_vocab_coverage" ->
      """WITH tokens AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents
        |), f AS (
        |  SELECT term, count(*)::BIGINT AS cnt FROM tokens GROUP BY 1
        |), v AS (
        |  SELECT term FROM (
        |    SELECT term, row_number() OVER (ORDER BY cnt DESC, term) AS rnk FROM f
        |  ) WHERE rnk <= 20
        |)
        |SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
        |  count(v.term)::BIGINT AS n_in_vocab,
        |  round(CAST(count(*) - count(v.term) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE), 6) AS oov_rate
        |FROM tokens t LEFT JOIN v ON t.term = v.term
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // scoring → binned-quantile thresholds → bucket CASE → per-bucket
    // window-sum budgets, each fragment identical to its standalone gate
    "q_pipeline_ccnet" -> {
      val hk = SketchOracleSql.splitmixBigintSql("doc_id")
      s"""WITH tokens AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
         |  FROM documents
         |), freq AS (
         |  SELECT term, count(*) AS cnt FROM tokens GROUP BY 1
         |), tot AS (SELECT sum(cnt) AS total FROM freq),
         |sc AS (
         |  SELECT doc_id, count(*)::BIGINT AS n_tokens,
         |    round(avg(-ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))), 4) AS surprisal
         |  FROM tokens JOIN freq USING (term) CROSS JOIN tot
         |  GROUP BY 1
         |), cnts AS (
         |  SELECT round(surprisal, 4) AS b, count(*) AS cnt FROM sc GROUP BY 1
         |), ranked AS (
         |  SELECT b, cnt,
         |    sum(cnt) OVER (ORDER BY b) AS cum,
         |    sum(cnt) OVER (ORDER BY b) - cnt + 1 AS first_rank
         |  FROM cnts
         |), totals AS (SELECT sum(cnt) AS n FROM cnts),
         |targets AS (
         |  SELECT n, p, CAST(floor(p * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 AS rlo,
         |    CAST(ceil(p * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1 AS rhi,
         |    p * CAST(n - 1 AS DOUBLE) - floor(p * CAST(n - 1 AS DOUBLE)) AS frac
         |  FROM totals, unnest(CAST([0.33, 0.67] AS DOUBLE[])) AS tp(p)
         |), lo AS (
         |  SELECT t.p, t.frac, r.b AS vlo
         |  FROM targets t JOIN ranked r ON t.rlo BETWEEN r.first_rank AND r.cum
         |), hi AS (
         |  SELECT t.p, t.frac, r.b AS vhi
         |  FROM targets t JOIN ranked r ON t.rhi BETWEEN r.first_rank AND r.cum
         |), thr AS (
         |  SELECT max(CASE WHEN lo.p = 0.33 THEN vlo + (vhi - vlo) * lo.frac END) AS q33,
         |    max(CASE WHEN lo.p = 0.67 THEN vlo + (vhi - vlo) * lo.frac END) AS q67
         |  FROM lo JOIN hi ON lo.p = hi.p
         |), bucketed AS (
         |  SELECT doc_id, n_tokens,
         |    CASE WHEN surprisal <= q33 THEN 'head'
         |         WHEN surprisal <= q67 THEN 'middle'
         |         ELSE 'tail' END AS bucket
         |  FROM sc, thr
         |), tb AS (
         |  SELECT bucket, doc_id, n_tok, bud,
         |    CAST(sum(n_tok) OVER (PARTITION BY bucket ORDER BY hk, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM (
         |    SELECT bucket, doc_id, n_tokens AS n_tok,
         |      CAST(CASE bucket WHEN 'head' THEN 6000
         |        WHEN 'middle' THEN 3000 ELSE 1500 END AS BIGINT) AS bud,
         |      ($hk) AS hk
         |    FROM bucketed)
         |)
         |SELECT bucket, doc_id, n_tok, cum_tokens FROM tb
         |WHERE cum_tokens <= bud
         |ORDER BY doc_id""".stripMargin
    },

    "q_sample_token_budget" -> {
      val hk = SketchOracleSql.splitmixBigintSql("doc_id")
      s"""SELECT doc_id, n_tok, cum_tokens FROM (
         |  SELECT doc_id, n_tok,
         |    CAST(sum(n_tok) OVER (ORDER BY hk, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM (
         |    SELECT doc_id,
         |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |      ($hk) AS hk
         |    FROM documents)
         |) WHERE cum_tokens <= 20000
         |ORDER BY doc_id""".stripMargin
    },

    "q_sample_domain_budget" -> {
      val hk = SketchOracleSql.splitmixBigintSql("doc_id")
      s"""SELECT source, doc_id, n_tok, cum_tokens FROM (
         |  SELECT source, doc_id, n_tok, bud,
         |    CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY hk, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM (
         |    SELECT source, doc_id,
         |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |      CAST(((CAST(substr(source, 4) AS INT) % 3) + 1) * 400 AS BIGINT) AS bud,
         |      ($hk) AS hk
         |    FROM documents)
         |) WHERE cum_tokens <= bud
         |ORDER BY doc_id""".stripMargin
    },

    "q_pipeline_mixture" -> {
      val hk0 = SketchOracleSql.splitmixBigintSql("doc_id")
      val hk = SketchOracleSql.splitmixBigintSql("xor(doc_id, 23::BIGINT)")
      s"""WITH tb AS (
         |  SELECT lang, doc_id, bud,
         |    sum(n_tok) OVER (PARTITION BY lang ORDER BY hk0, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM (
         |    SELECT lang, doc_id,
         |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |      CASE WHEN lang = 'en' THEN 12000 ELSE 4000 END AS bud,
         |      ($hk0) AS hk0
         |    FROM documents)
         |), kept AS (
         |  SELECT lang, doc_id FROM tb WHERE cum <= bud
         |), h AS (
         |  SELECT doc_id, lang, ($hk) AS hk,
         |    CASE lang WHEN 'en' THEN 0 WHEN 'zh' THEN 1 WHEN 'de' THEN 2
         |              WHEN 'es' THEN 3 WHEN 'fr' THEN 4 END AS sidx,
         |    CASE lang WHEN 'en' THEN 5 WHEN 'zh' THEN 3 WHEN 'de' THEN 2
         |              WHEN 'es' THEN 2 WHEN 'fr' THEN 1 END AS w
         |  FROM kept
         |), j AS (
         |  SELECT doc_id, lang, sidx, w,
         |    CAST(row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) - 1
         |      AS BIGINT) AS source_pos
         |  FROM h
         |), g AS (
         |  SELECT doc_id, lang, source_pos,
         |    CAST(row_number() OVER (
         |      ORDER BY (2 * source_pos + 1) * (30 // w), sidx) - 1
         |      AS BIGINT) AS global_pos,
         |    count(*) OVER () AS n
         |  FROM j
         |)
         |SELECT doc_id, lang, source_pos, global_pos,
         |  CAST((global_pos * 4) // n AS INT) AS shard,
         |  CAST(global_pos - (((global_pos * 4) // n) * n + 3) // 4 AS BIGINT) AS pos
         |FROM g ORDER BY doc_id""".stripMargin
    },

    // fp equality == normalized-text equality (collisions aside), so the
    // oracle compares the normalized strings directly
    "q_corpus_diff" ->
      """WITH v1 AS (
        |  SELECT doc_id,
        |    lower(regexp_replace(trim(CASE WHEN doc_id % 5 = 0
        |      THEN 'OLD ' || text ELSE text END), '\s+', ' ', 'g')) AS t
        |  FROM documents WHERE doc_id % 7 <> 0
        |), v2 AS (
        |  SELECT doc_id,
        |    lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
        |  FROM documents WHERE doc_id % 11 <> 0
        |)
        |SELECT coalesce(v1.doc_id, v2.doc_id) AS id,
        |  CASE WHEN v1.doc_id IS NULL THEN 'added'
        |       WHEN v2.doc_id IS NULL THEN 'removed'
        |       WHEN v1.t <> v2.t THEN 'changed' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        |WHERE (v1.doc_id IS NULL OR v2.doc_id IS NULL OR v1.t <> v2.t)
        |ORDER BY id""".stripMargin,

    // drift replay: identical smoothing denominators and op order (the
    // single ln per term type quantized with floor(1e6·x + 0.5))
    "q_corpus_drift" ->
      """WITH ta AS (
        |  SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |    w -> w <> '')) AS term
        |  FROM documents WHERE lang = 'en'
        |), tb AS (
        |  SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |    w -> w <> '')) AS term
        |  FROM documents WHERE lang <> 'en'
        |), caq AS (SELECT term, count(*)::BIGINT AS cnt_a FROM ta GROUP BY 1
        |), cbq AS (SELECT term, count(*)::BIGINT AS cnt_b FROM tb GROUP BY 1
        |), j AS (
        |  SELECT coalesce(caq.term, cbq.term) AS term,
        |    coalesce(cnt_a, 0::BIGINT) AS cnt_a,
        |    coalesce(cnt_b, 0::BIGINT) AS cnt_b
        |  FROM caq FULL OUTER JOIN cbq ON caq.term = cbq.term
        |), tot AS (
        |  SELECT CAST(sum(cnt_a) AS DOUBLE) AS ta, CAST(sum(cnt_b) AS DOUBLE) AS tb,
        |    CAST(count(*) AS DOUBLE) AS v
        |  FROM j
        |), k AS (
        |  SELECT term, cnt_a, cnt_b,
        |    CAST(floor(1000000.0 *
        |      (((CAST(cnt_a AS DOUBLE) + 1.0) / (tot.ta + tot.v)) *
        |       ln(((CAST(cnt_a AS DOUBLE) + 1.0) / (tot.ta + tot.v)) /
        |          ((CAST(cnt_b AS DOUBLE) + 1.0) / (tot.tb + tot.v)))) + 0.5)
        |      AS BIGINT) AS kl_micro
        |  FROM j, tot
        |)
        |SELECT term, cnt_a, cnt_b, kl_micro FROM k
        |ORDER BY kl_micro DESC, term LIMIT 40""".stripMargin,

    // temperature keep-set replay chained into the per-lang window-sum
    // budget replay (both fragments identical to their standalone gates)
    "q_pipeline_temperature" -> {
      val hk = SketchOracleSql.splitmixBigintSql("d.doc_id")
      val hkB = SketchOracleSql.splitmixBigintSql("doc_id")
      s"""WITH counts AS (
         |  SELECT lang, count(*) AS n,
         |    CAST(floor(pow(CAST(count(*) AS DOUBLE), 0.7) * 1e6 + 0.5) AS BIGINT) AS qp
         |  FROM documents GROUP BY 1
         |), tot AS (SELECT sum(n) AS nn, sum(qp) AS s FROM counts),
         |rates AS (
         |  SELECT lang,
         |    least(1.0, 0.5 * CAST(nn AS DOUBLE) * CAST(qp AS DOUBLE) /
         |      (CAST(s AS DOUBLE) * CAST(n AS DOUBLE))) AS rate
         |  FROM counts CROSS JOIN tot
         |), kept AS (
         |  SELECT d.doc_id, d.lang, d.text FROM documents d JOIN rates r USING (lang)
         |  WHERE (CASE WHEN ($hk) < 0
         |      THEN ($hk)::HUGEINT + 18446744073709551616::HUGEINT
         |      ELSE ($hk)::HUGEINT END) // 2048
         |    < CAST(floor(rate * 9007199254740992.0) AS BIGINT)::HUGEINT
         |), tb AS (
         |  SELECT lang, doc_id, n_tok, bud,
         |    CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY hk, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM (
         |    SELECT lang, doc_id,
         |      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |      CAST(CASE WHEN lang = 'en' THEN 3000 ELSE 1500 END AS BIGINT) AS bud,
         |      ($hkB) AS hk
         |    FROM kept)
         |)
         |SELECT lang, doc_id, n_tok, cum_tokens FROM tb
         |WHERE cum_tokens <= bud
         |ORDER BY doc_id""".stripMargin
    },

    // rate derivation mirrors the operator op for op: quantized pow per
    // class, integer normalizer sum, ((F·N)·qp)/(S·n), floor'd 2^53
    // threshold (CAST alone would round where Spark truncates)
    "q_sample_temperature" -> {
      val hk = SketchOracleSql.splitmixBigintSql("doc_id")
      s"""WITH counts AS (
         |  SELECT lang, count(*) AS n,
         |    CAST(floor(pow(CAST(count(*) AS DOUBLE), 0.7) * 1e6 + 0.5) AS BIGINT) AS qp
         |  FROM documents GROUP BY 1
         |), tot AS (SELECT sum(n) AS nn, sum(qp) AS s FROM counts),
         |rates AS (
         |  SELECT lang,
         |    least(1.0, 0.5 * CAST(nn AS DOUBLE) * CAST(qp AS DOUBLE) /
         |      (CAST(s AS DOUBLE) * CAST(n AS DOUBLE))) AS rate
         |  FROM counts CROSS JOIN tot
         |)
         |SELECT doc_id, lang, round(rate, 6) AS keep_rate FROM (
         |  SELECT d.doc_id, d.lang, r.rate,
         |    (CASE WHEN ($hk) < 0
         |      THEN ($hk)::HUGEINT + 18446744073709551616::HUGEINT
         |      ELSE ($hk)::HUGEINT END) // 2048 AS u53
         |  FROM documents d JOIN rates r USING (lang)
         |) WHERE u53 < CAST(floor(rate * 9007199254740992.0) AS BIGINT)::HUGEINT
         |ORDER BY doc_id""".stripMargin
    },

    "q_doc_split_grouped" -> {
      val sh = SketchOracleSql.stringHash64BigintSql("source", 0x1337L)
      val hk = SketchOracleSql.splitmixBigintSql(s"xor($sh, 42)")
      val t1 = math.floor(0.8 * 9007199254740992.0).toLong
      val t2 = math.floor(0.9 * 9007199254740992.0).toLong
      s"""SELECT doc_id, source,
         |  CASE WHEN u53 < ${t1}::HUGEINT THEN 'train'
         |       WHEN u53 < ${t2}::HUGEINT THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (
         |  SELECT doc_id, source,
         |    (CASE WHEN ($hk) < 0 THEN ($hk)::HUGEINT + 18446744073709551616::HUGEINT
         |          ELSE ($hk)::HUGEINT END) // 2048 AS u53
         |  FROM documents
         |)
         |ORDER BY doc_id""".stripMargin
    },

    "q_doc_split" -> {
      val hk = SketchOracleSql.splitmixBigintSql("xor(doc_id, 42)")
      val t1 = math.floor(0.8 * 9007199254740992.0).toLong
      val t2 = math.floor(0.9 * 9007199254740992.0).toLong
      s"""SELECT doc_id, source,
         |  CASE WHEN u53 < ${t1}::HUGEINT THEN 'train'
         |       WHEN u53 < ${t2}::HUGEINT THEN 'val'
         |       ELSE 'test' END AS split
         |FROM (
         |  SELECT doc_id, source,
         |    (CASE WHEN ($hk) < 0 THEN ($hk)::HUGEINT + 18446744073709551616::HUGEINT
         |          ELSE ($hk)::HUGEINT END) // 2048 AS u53
         |  FROM documents
         |)
         |ORDER BY doc_id""".stripMargin
    },

    "q_sample_mixture" -> {
      val hk = SketchOracleSql.splitmixBigintSql("doc_id")
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source,
         |    (CASE WHEN ($hk) < 0 THEN ($hk)::HUGEINT + 18446744073709551616::HUGEINT
         |          ELSE ($hk)::HUGEINT END) // 2048 AS u53,
         |    CAST(CAST((CAST(substr(source, 4) AS INT) % 4) + 1 AS DOUBLE) / 4.0
         |      * 9007199254740992.0 AS BIGINT) AS thr
         |  FROM documents
         |) WHERE u53 < thr::HUGEINT
         |ORDER BY doc_id""".stripMargin
    },

    "q_doc_chunks" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents
        |)
        |SELECT doc_id, CAST(k AS INT) AS chunk_idx,
        |  CAST(k * 48 AS BIGINT) AS start_tok,
        |  CAST(least(64, len(ws) - k * 48) AS BIGINT) AS n_tok,
        |  array_to_string(ws[k * 48 + 1 : k * 48 + least(64, len(ws) - k * 48)],
        |    ' ') AS chunk_text
        |FROM w, unnest(generate_series(0, (len(ws) - 1) // 48)) AS t(k)
        |WHERE len(ws) > 1 OR ws[1] <> ''
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_doc_vocab_topk" ->
      """WITH tokens AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents
        |), f AS (
        |  SELECT term, count(*)::BIGINT AS cnt FROM tokens GROUP BY 1
        |), r AS (
        |  SELECT CAST(row_number() OVER (ORDER BY cnt DESC, term) AS INT) AS rnk,
        |    term, cnt
        |  FROM f
        |)
        |SELECT rnk, term, cnt FROM r WHERE rnk <= 100 ORDER BY rnk""".stripMargin,

    "q_doc_shuffle_shards" -> {
      // shards = 8 → shift = 61; arithmetic >> replayed as floor division
      // (DuckDB // truncates toward zero, so the negative branch shifts
      // the numerator down by D-1 first)
      val hk = SketchOracleSql.splitmixBigintSql("xor(doc_id, 17::BIGINT)")
      val d = 1L << 61
      s"""WITH h AS (
         |  SELECT doc_id, ($hk) AS hk FROM documents
         |), s AS (
         |  SELECT doc_id, hk,
         |    CAST((CASE WHEN hk >= 0 THEN hk // ${d}
         |      ELSE ((hk::HUGEINT - ${d - 1}::HUGEINT) // ${d}::HUGEINT)::BIGINT END)
         |      + 4 AS INT) AS shard
         |  FROM h
         |)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hk, doc_id) - 1
         |    AS BIGINT) AS pos,
         |  CAST(row_number() OVER (ORDER BY shard, hk, doc_id) - 1
         |    AS BIGINT) AS global_pos
         |FROM s
         |ORDER BY doc_id""".stripMargin
    },

    "q_doc_interleave" -> {
      // LCM(5,3,2,2,1) = 30 → integer stride keys (2j+1)·(30/w); ties by
      // the weights-order source index — the sort-based twin of the
      // engine's analytic rank
      val hk = SketchOracleSql.splitmixBigintSql("xor(doc_id, 11::BIGINT)")
      s"""WITH h AS (
         |  SELECT doc_id, lang, ($hk) AS hk,
         |    CASE lang WHEN 'en' THEN 0 WHEN 'zh' THEN 1 WHEN 'de' THEN 2
         |              WHEN 'es' THEN 3 WHEN 'fr' THEN 4 END AS sidx,
         |    CASE lang WHEN 'en' THEN 5 WHEN 'zh' THEN 3 WHEN 'de' THEN 2
         |              WHEN 'es' THEN 2 WHEN 'fr' THEN 1 END AS w
         |  FROM documents
         |), j AS (
         |  SELECT doc_id, lang, sidx, w,
         |    CAST(row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) - 1
         |      AS BIGINT) AS source_pos
         |  FROM h
         |), g AS (
         |  SELECT doc_id, lang, source_pos,
         |    CAST(row_number() OVER (
         |      ORDER BY (2 * source_pos + 1) * (30 // w), sidx) - 1
         |      AS BIGINT) AS global_pos,
         |    count(*) OVER () AS n
         |  FROM j
         |)
         |SELECT doc_id, lang, source_pos, global_pos,
         |  CAST((global_pos * 8) // n AS INT) AS shard,
         |  CAST(global_pos - (((global_pos * 8) // n) * n + 7) // 8 AS BIGINT) AS pos
         |FROM g ORDER BY doc_id""".stripMargin
    },

    "q_doc_bigram_surprisal" -> {
      val lam = 0.7
      val om = 1.0 - lam // printed via Scala Double.toString == Spark's lit value
      s"""WITH w AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
         |), tokens AS (
         |  SELECT doc_id, unnest(ws) AS term FROM w
         |), uni AS (
         |  SELECT term, count(*)::BIGINT AS uc FROM tokens GROUP BY 1
         |), tot AS (SELECT CAST(sum(uc) AS DOUBLE) AS total FROM uni),
         |dp AS (
         |  SELECT doc_id, prev, cur, count(*)::BIGINT AS m FROM (
         |    SELECT doc_id, ws[i] AS prev, ws[i + 1] AS cur
         |    FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)
         |    WHERE len(ws) >= 2
         |  ) GROUP BY 1, 2, 3
         |), bc AS (
         |  SELECT prev, cur, CAST(sum(m) AS BIGINT) AS bc FROM dp GROUP BY 1, 2
         |), ts AS (
         |  SELECT b.prev, b.cur,
         |    CAST(floor(1000000.0 * -ln(
         |      CAST($lam AS DOUBLE) * (CAST(b.bc AS DOUBLE) / CAST(up.uc AS DOUBLE)) +
         |      CAST($om AS DOUBLE) * (CAST(uc2.uc AS DOUBLE) / tot.total)) + 0.5)
         |      AS BIGINT) AS micro
         |  FROM bc b JOIN uni up ON b.prev = up.term
         |    JOIN uni uc2 ON b.cur = uc2.term CROSS JOIN tot
         |)
         |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
         |  CAST(sum(m * micro) // sum(m) AS BIGINT) AS surprisal_micro
         |FROM dp JOIN ts USING (prev, cur)
         |GROUP BY 1
         |ORDER BY 1""".stripMargin
    },

    "q_doc_kn_surprisal" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents
        |), dp AS (
        |  SELECT doc_id, prev, cur, count(*)::BIGINT AS m FROM (
        |    SELECT doc_id, ws[i] AS prev, ws[i + 1] AS cur
        |    FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)
        |    WHERE len(ws) >= 2
        |  ) GROUP BY 1, 2, 3
        |), bc AS (
        |  SELECT prev, cur, CAST(sum(m) AS BIGINT) AS bc FROM dp GROUP BY 1, 2
        |), ctx AS (
        |  SELECT prev, CAST(sum(bc) AS BIGINT) AS cv, count(*)::BIGINT AS n1v
        |  FROM bc GROUP BY 1
        |), pred AS (
        |  SELECT cur, count(*)::BIGINT AS n1w FROM bc GROUP BY 1
        |), t AS (SELECT count(*)::BIGINT AS tt FROM bc),
        |ts AS (
        |  SELECT b.prev, b.cur,
        |    CAST(floor(1000000.0 * -ln(
        |      CAST(greatest(4 * b.bc - 3, 0) * t.tt + 3 * ctx.n1v * pred.n1w AS DOUBLE) /
        |      CAST(4 * ctx.cv * t.tt AS DOUBLE)) + 0.5) AS BIGINT) AS micro
        |  FROM bc b JOIN ctx USING (prev) JOIN pred USING (cur) CROSS JOIN t
        |)
        |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
        |  CAST(sum(m * micro) // sum(m) AS BIGINT) AS kn_micro
        |FROM dp JOIN ts USING (prev, cur)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q_embed_hard_negatives" ->
      """WITH n AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm
        |  FROM embeddings
        |), p AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS nid,
        |    list_sum(list_transform(generate_series(1, len(q.e)),
        |      i -> q.e[i] * c.e[i])) / (q.nrm * c.nrm) AS sim
        |  FROM n q JOIN n c
        |    ON q.vec_id < 10 AND c.vec_id <> q.vec_id AND c.label <> q.label
        |), r AS (
        |  SELECT qid, nid, sim,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INT) AS rnk
        |  FROM p
        |)
        |SELECT qid, nid, round(sim, 6) AS sim, rnk
        |FROM r WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,
  )
}
