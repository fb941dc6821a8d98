package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed merge-rule training — the BPE training loop (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") lifted to token level: each round counts all adjacent token
  * pairs across the corpus, takes the globally most frequent pair
  * (count desc, then lexicographic — a total order), and merges its
  * occurrences greedily left-to-right, non-overlapping, in every
  * document. Round t's counts see round t-1's merges, exactly like the
  * reference BPE trainer; the learned merge table IS the model
  * (word2phrase-style collocation discovery / tokenizer vocab growth).
  *
  * Scale shape: each round is ONE partial-aggregable groupBy over the
  * corpus pair stream plus a row-local merge pass; the only driver
  * traffic is the single winning (pair, count) row per round (the same
  * bounded per-round scalar as the connected-components convergence
  * check). The current tokenization persists between rounds so round t
  * does not replay rounds 1..t-1's merge passes.
  *
  * Determinism contract: pair counts are exact integers; the winner
  * order is (count desc, left asc, right asc); the merge is greedy
  * leftmost non-overlapping — equal to a leftmost global string
  * `replace`, which is how the oracle replays every round in SQL.
  */
object TokenizerTraining {

  /** One greedy leftmost non-overlapping merge pass of (l, r) → "l r"
    * over a token array — a linear fold with one token of lookbehind.
    */
  private[operators] def applyMerge(toks: Column, l: String, r: String): Column = {
    val init = struct(
      array().cast(ArrayType(StringType, containsNull = false)).as("out"),
      lit("").as("pend"), lit(false).as("has"))
    aggregate(toks, init,
      (acc, x) => {
        val isPair = acc.getField("has") &&
          acc.getField("pend") === lit(l) && x === lit(r)
        struct(
          when(isPair, concat(acc.getField("out"), array(lit(l + " " + r))))
            .otherwise(when(acc.getField("has"),
              concat(acc.getField("out"), array(acc.getField("pend"))))
              .otherwise(acc.getField("out"))).as("out"),
          when(isPair, lit("")).otherwise(x).as("pend"),
          not(isPair).as("has"))
      },
      acc => when(acc.getField("has"),
        concat(acc.getField("out"), array(acc.getField("pend"))))
        .otherwise(acc.getField("out")))
  }

  /** The same greedy merge as [[applyMerge]], as a LINEAR JVM pass for
    * the training hot loop: the Column fold's per-token array `concat`
    * copies the accumulated array every step — O(len²) per document,
    * and the dominant cost of a training round. Semantics are pinned
    * equal by the round-for-round trainer spec.
    */
  private def applyMergeRows(df: DataFrame, l: String, r: String): DataFrame = {
    val schema = df.schema
    val idx = schema.fieldIndex("__toks")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val merged = l + " " + r
    df.mapPartitions { rows =>
      rows.map { row =>
        val t = row.getSeq[String](idx)
        val n = t.length
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < n) {
          if (i + 1 < n && t(i) == l && t(i + 1) == r) { b += merged; i += 2 }
          else { b += t(i); i += 1 }
        }
        Row(b.toSeq)
      }
    }(enc)
  }

  /** Adjacent (l, r) pair stream of a token-array column. */
  private def pairStream(df: DataFrame): DataFrame = {
    val n = size(col("__toks"))
    df.select(explode(zip_with(
        slice(col("__toks"), lit(1), greatest(n - 1, lit(0))),
        slice(col("__toks"), lit(2), greatest(n - 1, lit(0))),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"))
  }

  /** Train `rounds` merge rules; returns (round, left, right, pair_count)
    * — the merge table, in learned order. Stops early if no adjacent
    * pair remains anywhere in the corpus.
    */
  def trainMerges(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds must be in [1, 64], got $rounds")
    val spark = df.sparkSession
    var cur = df.select(split(col(textCol), " ").as("__toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var parent: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      // this action materializes cur's cache, after which its parent's
      // cache is dead weight — no separate count() job needed. The
      // argmax rides the bounded-heap aggregate (count desc, l asc,
      // r asc — the exact tie rule) instead of a global sort + limit.
      val top = pairStream(cur)
        .groupBy(col("l"), col("r")).agg(count(lit(1)).as("c"))
        .agg(graft.functions.BoundedTopK.topK(
          struct(col("c").cast("double").as("c"), col("l"), col("r")), 1).as("t"))
        .select(col("t")(0).getField("l").as("l"), col("t")(0).getField("r").as("r"),
          col("t")(0).getField("c").cast("long").as("c"))
        .where(col("l").isNotNull)
        .collect()
      if (parent != null) { parent.unpersist(); parent = null }
      if (top.isEmpty) exhausted = true
      else {
        val w = top.head
        val (l, r, c) = (w.getString(0), w.getString(1), w.getLong(2))
        merges += ((round, l, r, c))
        if (round < rounds) { // the last round's merge is never counted
          parent = cur
          cur = applyMergeRows(cur, l, r)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        }
        round += 1
      }
    }
    if (parent != null) parent.unpersist()
    cur.unpersist()
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq.map {
        case (rd, l, r, c) => Row(rd, l, r, c) }, 1),
      StructType(Seq(
        StructField("round", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** Unigram-LM tokenizer training (Kudo 2018, "Subword Regularization:
    * Improving Neural Network Translation Models with Multiple Subword
    * Candidates" — the SentencePiece unigram model), hard-EM/Viterbi
    * variant, determinized: the soft-EM marginals of the original are
    * float folds no SQL oracle can replay bit-exactly, so this trains
    * with the textbook Viterbi-EM step — seed vocabulary from substring
    * frequencies, Viterbi-segment every word type under integer
    * micro-nat surprisal scores, re-count tokens from the best
    * segmentations, prune to the target vocabulary, re-score. Every
    * stage is integer-exact or once-quantized (the DSIR discipline):
    * scores are floor(10⁶·ln((T+V)/(c+1)) + 0.5) with one engine-side ln
    * per token TYPE, ties in the seed/prune ranks break token-asc, and
    * the Viterbi tie rule is (cost asc, longer-token wins) — a total
    * order the oracle replays stage by stage.
    *
    * Scale shape: word-type counts and substring/token counts are
    * partial-aggregable groupBys; seed/prune selection rides the
    * bounded heap (k-row state, never a global sort); segmentation is a
    * row-local pair of folds over word positions with the score map as
    * a plan-time literal (vocab is bounded: all single chars +
    * `seedMulti` multi-char candidates, require-guarded at the driver
    * collect). Words longer than `maxWordLen` chars are deterministically
    * chunked so the fold depth is bounded.
    *
    * `emIterations` runs the EM step multiple times (SentencePiece's
    * outer loop): each round re-scores the surviving vocabulary,
    * Viterbi re-segments every word type under the fresh scores,
    * re-counts, and prunes the multi-char tier to that round's budget —
    * a geometric shrink from `seedMulti` down to `vocabMulti`
    * ([[unigramBudgets]], the 0.75-per-round SentencePiece shrink
    * capped at the target), so early rounds keep slack for tokens the
    * next segmentation may promote. One round is exactly the previous
    * single-step trainer.
    *
    * Returns (tok, cnt, score): the post-EM vocabulary with its Viterbi
    * re-counts and final smoothed scores.
    */
  def trainUnigram(
      df: DataFrame, textCol: String,
      seedMulti: Int = 256, vocabMulti: Int = 128,
      maxTokenLen: Int = 4, maxWordLen: Int = 16,
      emIterations: Int = 1): DataFrame = {
    require(seedMulti >= 1 && seedMulti <= 4096,
      s"seedMulti must be in [1, 4096], got $seedMulti")
    require(vocabMulti >= 1 && vocabMulti <= seedMulti,
      s"vocabMulti must be in [1, seedMulti], got $vocabMulti")
    require(maxTokenLen >= 1 && maxTokenLen <= 8,
      s"maxTokenLen must be in [1, 8], got $maxTokenLen")
    require(maxWordLen >= maxTokenLen && maxWordLen <= 64,
      s"maxWordLen must be in [$maxTokenLen, 64], got $maxWordLen")
    require(emIterations >= 1 && emIterations <= 8,
      s"emIterations must be in [1, 8], got $emIterations")

    // word TYPES with counts; long words chunked to maxWordLen pieces
    val w0 = df.select(explode(split(lower(col(textCol)), " ")).as("w0"))
      .where(length(col("w0")) > 0)
    val words = w0.select(explode(transform(
        sequence(lit(0),
          ceil(length(col("w0")).cast("double") / lit(maxWordLen.toDouble))
            .cast("int") - 1),
        g => col("w0").substr(g * maxWordLen + 1, lit(maxWordLen)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // substring seed frequencies: every (start, len ≤ maxTokenLen)
    // occurrence, word-count-weighted — row-local explode, one groupBy
    val subs = words.select(col("cnt"), explode(flatten(transform(
        sequence(lit(0), length(col("w")) - 1),
        i => filter(transform(sequence(lit(1), lit(maxTokenLen)),
          k => when(i + k <= length(col("w")), col("w").substr(i + 1, k))),
          x => x.isNotNull)))).as("tok"))
      .groupBy(col("tok")).agg(sum(col("cnt")).as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // seed vocabulary: ALL single chars (coverage guarantee — every word
    // stays segmentable) + top-seedMulti multi-char substrings by
    // (freq desc, tok asc) via the bounded heap
    val chars = subs.where(length(col("tok")) === 1)
    val multiTop = subs.where(length(col("tok")) > 1)
      .agg(graft.functions.BoundedTopK.topK(
        struct(col("freq").cast("double").as("s"), col("tok"), col("freq")),
        seedMulti).as("t"))
      .select(explode(col("t")).as("x"))
      .select(col("x.tok").as("tok"), col("x.freq").as("freq"))
    val seedv = chars.select(col("tok"), col("freq")).unionByName(multiTop)

    // EM rounds: score → Viterbi re-segment → re-count → prune to the
    // round's budget. Each round collects the (require-bounded ≤ 8192
    // rows) vocabulary ONCE and computes the Laplace-smoothed integer
    // micro-nat scores DRIVER-side — `Math.log` is the same JVM
    // function the engine's `log` expression calls, so the quantized
    // scores are bit-identical to an engine-side pass (pinned by the
    // plain-Scala reference property test), and the vocabulary lineage
    // (a full Viterbi pass per round after round 1) evaluates once per
    // round instead of twice (total agg + join).
    val budgets = unigramBudgets(seedMulti, vocabMulti, emIterations)
    var vocab = seedv
    for (round <- 1 to emIterations) {
      val roundRows = collectScored(vocab, 8192, "seedMulti")
      val scores = roundRows.map { case (tok, _, s) => tok -> s }.toMap

      // hard-EM step: Viterbi re-segmentation + token re-counts
      val seg = words.select(col("cnt"),
          explode(viterbiSegment(col("w"), scores, maxTokenLen)).as("tok"))
        .groupBy(col("tok")).agg(sum(col("cnt")).as("cnt2"))
      // prune: chars always survive (coverage); top-budget multi-char
      // tokens by (count desc, tok asc)
      val keptMulti = seg.where(length(col("tok")) > 1)
        .agg(graft.functions.BoundedTopK.topK(
          struct(col("cnt2").cast("double").as("s"), col("tok"), col("cnt2")),
          budgets(round - 1)).as("t"))
        .select(explode(col("t")).as("x"))
        .select(col("x.tok").as("tok"), col("x.cnt2").as("freq"))
      vocab = chars.select(col("tok"))
        .join(seg, Seq("tok"), "left")
        .select(col("tok"), coalesce(col("cnt2"), lit(0L)).as("freq"))
        .unionByName(keptMulti)
    }
    val finalRows = collectScored(vocab, 8192, "vocabMulti")
    // release the round caches only AFTER the result is materialized —
    // nothing downstream recomputes through the unpersisted lineage
    words.unpersist()
    subs.unpersist()
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(
        finalRows.map { case (t, c, s) => Row(t, c, s) }.toSeq, 1),
      StructType(Seq(
        StructField("tok", StringType, nullable = true),
        StructField("cnt", LongType, nullable = true),
        StructField("score", LongType, nullable = true))))
  }

  /** Collect a (tok, freq) vocabulary frame ONCE (require-bounded) and
    * attach the Laplace-smoothed integer micro-nat surprisal scores
    * driver-side: floor(10⁶·ln((T+V)/(c+1)) + 0.5) with `Math.log` —
    * the exact function the engine's `log` expression evaluates, so the
    * quantized scores are bit-identical to an engine-side scoring pass
    * (pinned by the plain-Scala reference property tests) while the
    * vocabulary lineage evaluates once instead of twice (total
    * aggregate + scoring join).
    */
  private def collectScored(v: DataFrame, bound: Int,
      knob: String): Array[(String, Long, Long)] = {
    val rows = v.select(col("tok"), col("freq")).collect()
    require(rows.length <= bound,
      s"unigram vocabulary ${rows.length} exceeds the bounded " +
        s"driver budget ($bound) — lower $knob")
    val t = rows.map(_.getAs[Long]("freq")).sum
    val nv = rows.length
    rows.map { r =>
      val c = r.getAs[Long]("freq")
      (r.getAs[String]("tok"), c,
        math.floor(1e6 * math.log((t + nv).toDouble / (c + 1).toDouble)
          + 0.5).toLong)
    }
  }

  /** Per-round multi-char prune budgets for [[trainUnigram]]: a
    * geometric 0.75-per-round shrink from `seedMulti`, floored at
    * `vocabMulti`, with the LAST round pinned to `vocabMulti` exactly —
    * closed-form integers, so oracle SQL embeds the same literals.
    */
  def unigramBudgets(seedMulti: Int, vocabMulti: Int, rounds: Int): Seq[Int] =
    (1 to rounds).map { r =>
      if (r == rounds) vocabMulti
      else {
        // floor(seedMulti * 3^r / 4^r) in exact integer arithmetic
        val num = BigInt(seedMulti) * BigInt(3).pow(r)
        math.max(vocabMulti, (num / BigInt(4).pow(r)).toInt)
      }
    }

  /** Encode a corpus with a trained unigram vocabulary ([[trainUnigram]]
    * output collected to a bounded score map): per-document token arrays
    * under Viterbi segmentation. The scalable shape: each word TYPE is
    * segmented ONCE (the corpus's type table is orders of magnitude
    * smaller than its token stream) and documents join their words back
    * to the segmented types — the DP never runs per occurrence. Long
    * words chunk exactly as in training, so encode and training see the
    * same word universe.
    *
    * Returns (idCol, tokens array<string>, n_tokens) — token order
    * follows document word order (chunks in order), per-word
    * segmentation order inside.
    */
  def encodeUnigram(
      df: DataFrame, textCol: String, idCol: String,
      scores: Map[String, Long],
      maxTokenLen: Int = 4, maxWordLen: Int = 16): DataFrame = {
    require(scores.nonEmpty, "encodeUnigram needs a non-empty score map")
    val docWords = df.select(col(idCol),
        posexplode(split(lower(col(textCol)), " ")).as(Seq("wp", "w0")))
      .where(length(col("w0")) > 0)
      .select(col(idCol), col("wp"),
        posexplode(transform(
          sequence(lit(0),
            ceil(length(col("w0")).cast("double") / lit(maxWordLen.toDouble))
              .cast("int") - 1),
          g => col("w0").substr(g * maxWordLen + 1, lit(maxWordLen))))
          .as(Seq("cp", "w")))
    val types = docWords.select(col("w")).distinct()
      .select(col("w"), viterbiSegment(col("w"), scores, maxTokenLen).as("toks"))
    docWords.join(types, Seq("w"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("wp"), col("cp"), col("toks")))),
        x => x.getField("toks"))).as("tokens"))
      .select(col(idCol), col("tokens"), size(col("tokens")).as("n_tokens"))
  }

  /** Unigram-LM pruning by LOSS DELTA (SentencePiece's actual
    * criterion, hard-EM/Viterbi form; Kudo 2018 §3.2): instead of
    * keeping the most-COUNTED multi-char tokens, keep the tokens whose
    * REMOVAL most increases total corpus cost. Per word type the
    * Viterbi best cost is the sum of its tokens' scores; for every
    * multi-char token in that best segmentation the ALTERNATIVE cost
    * re-runs the same integer DP with the token masked (single chars
    * are never masked, so a path always exists), and the token's loss
    * delta is Σ cnt(w)·(alt_cost − best_cost) over the word types that
    * use it — all integer micro-nats, once-quantized, so the oracle
    * replays the whole derivation (a masked DP per (word, token) pair,
    * fanned over the pairs table). Count-pruning can evict a
    * rare-but-irreplaceable token whose words would re-segment
    * expensively; delta-pruning keeps exactly the irreplaceable ones.
    *
    * Scale shape mirrors [[trainUnigram]]: word-TYPE table, row-local
    * DPs (the masked DP runs once per (type, distinct-multi-token)
    * pair — ≤ maxWordLen pairs per type), one groupBy for the deltas,
    * bounded-heap prune, driver state ≤ the vocab require.
    *
    * `emIterations` puts the loss criterion INSIDE SentencePiece's
    * outer EM loop: each round re-scores the surviving vocabulary,
    * re-segments, recomputes the masked-DP deltas under the FRESH
    * scores, and prunes to that round's [[unigramBudgets]] budget —
    * so a token's irreplaceability is re-judged against the routes the
    * previous prune left open, not frozen at the seed segmentation.
    * One round is exactly the previous single-step form.
    *
    * Returns (tok, cnt, delta, score): Viterbi re-counts, the loss
    * delta that ranked the token in the LAST round (0 for single
    * chars — coverage tokens are never at risk), and final smoothed
    * scores.
    */
  def trainUnigramLossPrune(
      df: DataFrame, textCol: String,
      seedMulti: Int = 64, vocabMulti: Int = 32,
      maxTokenLen: Int = 4, maxWordLen: Int = 16,
      emIterations: Int = 1): DataFrame = {
    require(emIterations >= 1 && emIterations <= 8,
      s"emIterations must be in [1, 8], got $emIterations")
    trainUnigramSchedule(df, textCol, seedMulti, vocabMulti,
      maxTokenLen, maxWordLen, Seq.fill(emIterations)("loss"))
  }

  /** The EM loop with a PER-ROUND prune criterion — SentencePiece's
    * practical schedule runs the cheap COUNT criterion early (while the
    * candidate pool is large and a masked DP per (word, token) pair
    * would dominate training cost) and the exact LOSS criterion late,
    * where evicting an irreplaceable token can no longer be corrected.
    * `criteria(r)` ∈ {"count", "loss"} picks round r+1's rule; budgets
    * follow the shared [[unigramBudgets]] schedule either way, so
    * `Seq.fill(n)("loss")` is exactly [[trainUnigramLossPrune]] and the
    * mixed schedule is comparable round for round. Count rounds skip
    * the masked DPs entirely — their cost is one Viterbi pass, the
    * [[trainUnigram]] round shape.
    *
    * Returns (tok, cnt, delta, score); `delta` is 0 for every token
    * whose LAST ranking round used the count criterion (no masked DP
    * ran — the column reports the evidence that ranked the token, not
    * a retroactive audit).
    */
  def trainUnigramSchedule(
      df: DataFrame, textCol: String,
      seedMulti: Int = 64, vocabMulti: Int = 32,
      maxTokenLen: Int = 4, maxWordLen: Int = 16,
      criteria: Seq[String] = Seq("loss")): DataFrame = {
    require(seedMulti >= 1 && seedMulti <= 4096,
      s"seedMulti must be in [1, 4096], got $seedMulti")
    require(vocabMulti >= 1 && vocabMulti <= seedMulti,
      s"vocabMulti must be in [1, seedMulti], got $vocabMulti")
    require(maxTokenLen >= 1 && maxTokenLen <= 8,
      s"maxTokenLen must be in [1, 8], got $maxTokenLen")
    require(maxWordLen >= maxTokenLen && maxWordLen <= 64,
      s"maxWordLen must be in [$maxTokenLen, 64], got $maxWordLen")
    require(criteria.nonEmpty && criteria.size <= 8,
      s"criteria must have 1..8 rounds, got ${criteria.size}")
    require(criteria.forall(c => c == "count" || c == "loss"),
      s"criteria entries must be 'count' or 'loss', got $criteria")
    val emIterations = criteria.size
    val spark = df.sparkSession

    val w0 = df.select(explode(split(lower(col(textCol)), " ")).as("w0"))
      .where(length(col("w0")) > 0)
    val words = w0.select(explode(transform(
        sequence(lit(0),
          ceil(length(col("w0")).cast("double") / lit(maxWordLen.toDouble))
            .cast("int") - 1),
        g => col("w0").substr(g * maxWordLen + 1, lit(maxWordLen)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val subs = words.select(col("cnt"), explode(flatten(transform(
        sequence(lit(0), length(col("w")) - 1),
        i => filter(transform(sequence(lit(1), lit(maxTokenLen)),
          k => when(i + k <= length(col("w")), col("w").substr(i + 1, k))),
          x => x.isNotNull)))).as("tok"))
      .groupBy(col("tok")).agg(sum(col("cnt")).as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chars = subs.where(length(col("tok")) === 1)
    val multiTop = subs.where(length(col("tok")) > 1)
      .agg(graft.functions.BoundedTopK.topK(
        struct(col("freq").cast("double").as("s"), col("tok"), col("freq")),
        seedMulti).as("t"))
      .select(explode(col("t")).as("x"))
      .select(col("x.tok").as("tok"), col("x.freq").as("freq"))
    val seedv = chars.select(col("tok"), col("freq")).unionByName(multiTop)

    // EM rounds with the LOSS criterion (SentencePiece's outer loop and
    // its actual prune rule together): score → Viterbi re-segment →
    // re-count → masked-DP loss deltas → keep the round's budget of
    // multis by LARGEST loss increase. Budgets follow the same
    // 0.75-geometric [[unigramBudgets]] schedule as the count-pruning
    // trainer; one round is exactly the previous single-step form.
    val budgets = unigramBudgets(seedMulti, vocabMulti, emIterations)
    var vocab = seedv.select(col("tok"), col("freq"), lit(0L).as("delta"))
    for (round <- 1 to emIterations) {
      val scores = collectScored(
        vocab.select(col("tok"), col("freq")), 8192, "seedMulti")
        .map { case (tok, _, s) => tok -> s }.toMap

      val (next, release): (DataFrame, () => Unit) =
        if (criteria(round - 1) == "loss") {
          val sMap = typedLit(scores)
          // Viterbi per word TYPE; base cost = sum of the best tokens'
          // scores
          val seg = words.select(col("w"), col("cnt"),
              viterbiSegment(col("w"), scores, maxTokenLen).as("toks"))
            .withColumn("cost", aggregate(col("toks"), lit(0L),
              (a, t) => a + element_at(sMap, t)))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val cnts = seg.select(col("cnt"), explode(col("toks")).as("tok"))
            .groupBy(col("tok")).agg(sum(col("cnt")).as("cnt2"))

          // masked alternative cost, one DP per (word type, distinct
          // multi-char token of its best segmentation)
          val deltas = seg.select(col("w"), col("cnt"), col("cost"),
              explode(array_distinct(filter(col("toks"),
                t => length(t) > 1))).as("mtok"))
            .withColumn("mcost",
              viterbiCostMasked(col("w"), scores, maxTokenLen, col("mtok")))
            .groupBy(col("mtok"))
            .agg(sum(col("cnt") * (col("mcost") - col("cost"))).as("delta"))
            .select(col("mtok").as("tok"), col("delta"))

          // prune: chars always survive; multis keep the round's budget
          // by LARGEST loss increase (delta desc, tok asc — the heap)
          val keptMulti = deltas.join(cnts, Seq("tok"))
            .agg(graft.functions.BoundedTopK.topK(
              struct(col("delta").cast("double").as("s"), col("tok"),
                col("cnt2"), col("delta")), budgets(round - 1)).as("t"))
            .select(explode(col("t")).as("x"))
            .select(col("x.tok").as("tok"), col("x.cnt2").as("freq"),
              col("x.delta").as("delta"))
          (chars.select(col("tok"))
            .join(cnts, Seq("tok"), "left")
            .select(col("tok"), coalesce(col("cnt2"), lit(0L)).as("freq"),
              lit(0L).as("delta"))
            .unionByName(keptMulti), () => { seg.unpersist(); () })
        } else {
          // COUNT round — one Viterbi pass, no masked DPs (the
          // trainUnigram round shape): multis keep the budget by
          // (count desc, tok asc), delta 0 (no loss evidence ran)
          val cnts = words.select(col("cnt"),
              explode(viterbiSegment(col("w"), scores, maxTokenLen)).as("tok"))
            .groupBy(col("tok")).agg(sum(col("cnt")).as("cnt2"))
          val keptMulti = cnts.where(length(col("tok")) > 1)
            .agg(graft.functions.BoundedTopK.topK(
              struct(col("cnt2").cast("double").as("s"), col("tok"),
                col("cnt2")), budgets(round - 1)).as("t"))
            .select(explode(col("t")).as("x"))
            .select(col("x.tok").as("tok"), col("x.cnt2").as("freq"),
              lit(0L).as("delta"))
          (chars.select(col("tok"))
            .join(cnts, Seq("tok"), "left")
            .select(col("tok"), coalesce(col("cnt2"), lit(0L)).as("freq"),
              lit(0L).as("delta"))
            .unionByName(keptMulti), () => ())
        }
      // materialize the round's vocabulary BEFORE seg unpersists: the
      // next round's collectScored must not recompute through a
      // released cache (bounded rows — the same collect feeds either
      // the next round's scores or the final result)
      val matRows = next.collect()
      require(matRows.length <= 8192,
        s"unigram vocabulary ${matRows.length} exceeds the bounded " +
          "driver budget (8192) — lower vocabMulti")
      release()
      vocab = spark.createDataFrame(
        spark.sparkContext.parallelize(matRows.toSeq, 1),
        StructType(Seq(
          StructField("tok", StringType, nullable = true),
          StructField("freq", LongType, nullable = true),
          StructField("delta", LongType, nullable = true))))
    }
    // one bounded collect (tok, freq, delta ≤ 8192 rows), scores
    // attached driver-side — the collectScored discipline
    val vocabRows = vocab.select(col("tok"), col("freq"), col("delta"))
      .collect()
    val t = vocabRows.map(_.getAs[Long]("freq")).sum
    val nv = vocabRows.length
    val finalRows = vocabRows.map { r =>
      val c = r.getAs[Long]("freq")
      Row(r.getAs[String]("tok"), c, r.getAs[Long]("delta"),
        math.floor(1e6 * math.log((t + nv).toDouble / (c + 1).toDouble)
          + 0.5).toLong)
    }
    words.unpersist(); subs.unpersist()
    spark.createDataFrame(
      spark.sparkContext.parallelize(finalRows.toSeq, 1),
      StructType(Seq(
        StructField("tok", StringType, nullable = true),
        StructField("cnt", LongType, nullable = true),
        StructField("delta", LongType, nullable = true),
        StructField("score", LongType, nullable = true))))
  }

  /** The Viterbi FORWARD cost with one token masked (treated as
    * out-of-vocabulary): the same per-position fold as
    * [[viterbiSegment]], costs only, with the mask compared per
    * candidate — the mask is a COLUMN, so one plan segment serves every
    * (word, token) pair. Single chars are never masked upstream, so the
    * masked word remains segmentable (cost < the INF sentinel).
    */
  private[operators] def viterbiCostMasked(word: Column,
      scores: Map[String, Long], maxTokenLen: Int, mask: Column): Column = {
    val INF = 1000000000000000L
    val sMap = typedLit(scores)
    val fwd = aggregate(
      sequence(lit(1), length(word)),
      array(lit(0L)),
      (costs, i) => {
        val cands = array((1 to maxTokenLen).map { k =>
          when(i >= k, {
            val tok = word.substr(i - k + 1, lit(k))
            element_at(costs, (i - k + 1).cast("int")) +
              when(tok === mask, lit(INF))
                .otherwise(coalesce(element_at(sMap, tok), lit(INF)))
          })
        }: _*)
        concat(costs, array(array_min(filter(cands, x => x.isNotNull))))
      })
    element_at(fwd, (length(word) + 1).cast("int"))
  }

  /** Viterbi segmentation of one word under a literal score map —
    * row-local, zero shuffles, plain HOF folds. Forward pass: one fold
    * over positions carrying (costs, ks) arrays; the best last token at
    * each position minimizes (cost asc, token-length DESC) via
    * `array_min` over (cost, -k) candidate structs. Backtrack: a second
    * bounded fold walking the recorded ks, prepending tokens. Missing
    * tokens cost an unreachable sentinel; single-char tokens are always
    * in the vocabulary, so every position stays reachable.
    */
  private[operators] def viterbiSegment(word: Column,
      scores: Map[String, Long], maxTokenLen: Int): Column = {
    val INF = 1000000000000000L // sentinel; bounded adds never overflow
    val sMap = typedLit(scores)
    val fwd = aggregate(
      sequence(lit(1), length(word)),
      struct(array(lit(0L)).as("costs"),
        array().cast("array<int>").as("ks")),
      (acc, i) => {
        val cands = array((1 to maxTokenLen).map { k =>
          when(i >= k, struct(
            (element_at(acc.getField("costs"), (i - k + 1).cast("int")) +
              coalesce(element_at(sMap, word.substr(i - k + 1, lit(k))),
                lit(INF))).as("c"),
            lit(-k).as("nk")))
        }: _*)
        val best = array_min(filter(cands, x => x.isNotNull))
        struct(
          concat(acc.getField("costs"), array(best.getField("c"))).as("costs"),
          concat(acc.getField("ks"),
            array((lit(0) - best.getField("nk")).cast("int"))).as("ks"))
      })
    aggregate(
      sequence(lit(1), length(word)),
      struct(length(word).cast("int").as("pos"),
        array().cast("array<string>").as("toks"),
        fwd.getField("ks").as("ks")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val k = element_at(acc.getField("ks"), pos)
        when(pos > 0, struct(
          (pos - k).cast("int").as("pos"),
          concat(array(word.substr(pos - k + 1, k)),
            acc.getField("toks")).as("toks"),
          acc.getField("ks").as("ks")))
          .otherwise(acc)
      },
      acc => acc.getField("toks"))
  }

  /** Apply a learned merge table (in order) to a corpus — the encode
    * side of the trainer; row-local, zero shuffles.
    */
  def encodeWithMerges(
      df: DataFrame, textCol: String,
      merges: Seq[(String, String)], outCol: String = "tokens"): DataFrame = {
    val toks = merges.foldLeft(split(col(textCol), " ")) {
      case (acc, (l, r)) => applyMerge(acc, l, r)
    }
    df.withColumn(outCol, toks)
  }
}
