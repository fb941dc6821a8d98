package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
import graft.functions.{BoundedTopK, Sketches, TextFunctions}

/** Corpus-curation operators for large-scale training-data pipelines:
  * repetition quality signals (Gopher-style), deterministic sequence
  * packing ("concat and chunk"), and deterministic stratified sampling.
  *
  * These extend the reference's query surface the way a 100 TB
  * pretraining pipeline needs (see Rae et al., "Scaling Language Models:
  * Methods, Analysis & Insights from Training Gopher", §A1.1 for the
  * repetition filters; the packing layout is the standard concat-and-chunk
  * used by GPT-style dataloaders). Everything here is deterministic and
  * replayable in ANSI SQL, so every operator carries an exact DuckDB
  * oracle in [[graft.queries.CurationQueries]].
  *
  * Scale stance:
  *  - repetition signals are two hash-partitioned aggregations keyed by
  *    (doc, gram) then doc — the canonical shape; nothing is per-corpus.
  *  - packing windows are partitioned by shard: each shard is an
  *    independent total order, so parallelism = shard count (pick shards
  *    ≈ cluster cores at 100 TB; the layout is reproducible for any
  *    fixed shard count).
  *  - sampling state is a bounded heap per group ([[BoundedTopK]]), never
  *    a per-group window over all members.
  */
object Curation {

  /** The canonical seeded per-row hash key shared by the deterministic
    * samplers/schedulers: integral ids go through splitmix64 directly
    * (the oracle-replayed formulation), string ids hash via
    * stringHash64 first. Anything else fails fast — a silent
    * `cast("long")` would yield null for every row and collapse the
    * seeded order into plain id order inside one null bucket.
    */
  private[operators] def seededHashKey(
      df: DataFrame, idCol: String, seed: Long): Column =
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        Sketches.splitmixLong(col(idCol).cast("long").bitwiseXOR(lit(seed)))
      case StringType =>
        Sketches.splitmixLong(
          Sketches.stringHash64(col(idCol), 0x1337L).bitwiseXOR(lit(seed)))
      case t => throw new IllegalArgumentException(
        s"id column '$idCol' must be integral or string for seeded hashing, got $t")
    }

  private def words(c: Column): Column = graft.functions.WhitespaceTokens.wsTokens(c)

  /** Word n-grams of `textCol` as an array column; empty when the doc has
    * fewer than `n` words (never a partial gram).
    */
  private def grams(wordsCol: Column, n: Int): Column =
    when(size(wordsCol) >= n,
      transform(sequence(lit(0), size(wordsCol) - n),
        i => concat_ws(" ", slice(wordsCol, i + 1, lit(n)))))
      .otherwise(array())

  /** Gopher-style per-document repetition signals:
    *
    *  - `word_rep`: 1 − distinct_words / total_words — bulk word reuse.
    *  - `top2_frac` / `top3_frac`: characters covered by the most frequent
    *    word {2,3}-gram (count × gram length / doc chars) — detects a
    *    single repeated phrase dominating the doc.
    *  - `dup5_frac`: characters covered by all 5-grams occurring ≥ 2
    *    times — detects diffuse boilerplate (can exceed 1 on heavily
    *    overlapping repeats; it is a signal, not a proportion).
    *
    * All ratios round to 4 decimals. Docs shorter than the gram size get
    * 0.0. ZERO shuffles: gram occurrence counts come from a sorted-run
    * fold over the per-row gram array (sort, then one linear `aggregate`
    * pass closing a run whenever the gram changes) — per-document work is
    * independent of corpus size, so the operator is a pure map over any
    * number of executors. Coverage stays in exact integer char units
    * (cnt × gram length) until a single final division per doc, which is
    * what makes the oracle replay (an unnest+GROUP BY formulation of the
    * same counts) exactly equal.
    */
  def repetitionSignals(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val id = col(idCol)
    val ws = words(col(textCol))

    // (top covered-chars of any single gram, total covered chars of grams
    // occurring >= 2 times) — one codegen'd hash pass per row
    // (GramCoverage); integer char units, order-independent, so the
    // value is bit-identical to the former sorted-run fold and the
    // oracle's unnest+GROUP BY replay
    def coverage(n: Int): Column = graft.functions.GramCoverage.gramCoverage(col("ws"), n)

    df.select(id,
        length(col(textCol)).cast("double").as("n_chars"),
        ws.as("ws"))
      .select(id, col("n_chars"),
        size(col("ws")).cast("long").as("n_words"),
        round(lit(1.0) - size(array_distinct(col("ws"))).cast("double") /
          greatest(size(col("ws")).cast("double"), lit(1.0)), 4).as("word_rep"),
        coverage(2).as("c2"), coverage(3).as("c3"), coverage(5).as("c5"))
      .select(id, col("n_words"), col("word_rep"),
        round(col("c2.top").cast("double") / col("n_chars"), 4).as("top2_frac"),
        round(col("c3.top").cast("double") / col("n_chars"), 4).as("top3_frac"),
        round(col("c5.dup").cast("double") / col("n_chars"), 4).as("dup5_frac"))
  }

  /** Deterministic token-budget subsample — "take N tokens from the
    * corpus": keep documents in splitmix64(id) hash order (a uniform
    * deterministic shuffle; id-asc tiebreak) until the running token
    * total passes `budget` (a document is kept iff its INCLUSIVE
    * running total ≤ budget). The standard pretraining-mixture primitive
    * ("sample 50B tokens of web text"), engine-replayable: the oracle
    * reproduces the hash order and the integer running sum exactly.
    *
    * Scale shape: a single global running sum would be one sorted
    * partition. Instead hk-range buckets (monotone in the hash order)
    * give a two-pass layout: per-bucket token totals (≤ `buckets` rows —
    * a driver-sized frame, same stance as the IVF init window) yield
    * each bucket's starting offset; the within-bucket running sum is a
    * window over independent bucket partitions, so parallelism = bucket
    * count. Nothing corpus-sized ever sits in one task.
    */
  def tokenBudget(
      df: DataFrame, idCol: String, tokensCol: Column, budget: Long,
      buckets: Int = 4096): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two >= 2, got $buckets")
    val shift = 64 - Integer.numberOfTrailingZeros(buckets)
    val id = col(idCol)
    val withTok = df.select(id, tokensCol.cast("long").as("n_tok"),
        Sketches.splitmixLong(id).as("__hk"))
      // arithmetic >> keeps signed order, so bucket id is monotone in hk
      .withColumn("__bucket", shiftright(col("__hk"), shift) + lit(buckets / 2))
    val wB = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withTok.groupBy(col("__bucket"))
      .agg(sum(col("n_tok")).as("__btok"))
      .withColumn("__offset", coalesce(sum(col("__btok")).over(wB), lit(0L)))
      .select(col("__bucket"), col("__offset"))
    val wIn = Window.partitionBy(col("__bucket")).orderBy(col("__hk"), id)
      .rowsBetween(Window.unboundedPreceding, 0)
    withTok.join(broadcast(offsets), "__bucket")
      .withColumn("cum_tokens", col("__offset") + sum(col("n_tok")).over(wIn))
      .where(col("cum_tokens") <= budget)
      .select(id, col("n_tok"), col("cum_tokens"))
  }

  /** Per-group [[tokenBudget]] — the dataset-mixture builder: each group
    * (domain, source, language) keeps its documents in splitmix64 hash
    * order until the group's own running token total passes the group's
    * own budget ("2B tokens of web, 500M of code, …"). `budget` is a
    * per-row Column evaluated on the group's rows (same contract as
    * [[sampleMixture]]'s rate), so budgets can be data-derived.
    *
    * Same two-pass bounded-state shape as [[tokenBudget]], with the
    * group prepended to every key: bucket offsets aggregate to
    * (groups × buckets) rows (broadcast), and the in-bucket window is
    * PARTITIONED BY (group, bucket) — parallelism is groups × buckets
    * and no task ever holds more than one bucket of one group. The kept
    * set is exactly the per-group hash-order prefix, engine-replayable.
    *
    * Contract: the group column must be non-null (a null group would be
    * dropped by the offset key join, not budgeted).
    */
  def tokenBudgetByGroup(
      df: DataFrame, groupCol: String, idCol: String, tokensCol: Column,
      budget: Column, buckets: Int = 4096): DataFrame = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two >= 2, got $buckets")
    val shift = 64 - Integer.numberOfTrailingZeros(buckets)
    val grp = col(groupCol)
    val id = col(idCol)
    // fail-loud budget validation (the per-row analogue of tokenBudget's
    // require): a NULL or negative budget would otherwise silently drop
    // the whole group through the `cum <= budget` filter
    val budgetChecked = {
      val b = budget.cast("long")
      when(b.isNull || b < 0, raise_error(concat(
        lit("tokenBudgetByGroup: null/negative budget for group "),
        grp.cast("string"))).cast("long"))
        .otherwise(b)
    }
    val withTok = df.select(grp, id, tokensCol.cast("long").as("n_tok"),
        budgetChecked.as("__budget"), Sketches.splitmixLong(id).as("__hk"))
      .withColumn("__bucket", shiftright(col("__hk"), shift) + lit(buckets / 2))
    val wB = Window.partitionBy(grp).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withTok.groupBy(grp, col("__bucket"))
      .agg(sum(col("n_tok")).as("__btok"))
      .withColumn("__offset", coalesce(sum(col("__btok")).over(wB), lit(0L)))
      .select(grp, col("__bucket"), col("__offset"))
    val wIn = Window.partitionBy(grp, col("__bucket")).orderBy(col("__hk"), id)
      .rowsBetween(Window.unboundedPreceding, 0)
    withTok.join(broadcast(offsets), Seq(groupCol, "__bucket"))
      .withColumn("cum_tokens", col("__offset") + sum(col("n_tok")).over(wIn))
      .where(col("cum_tokens") <= col("__budget"))
      .select(grp, id, col("n_tok"), col("cum_tokens"))
  }

  /** Deterministic "concat and chunk" sequence packing: lay out documents
    * token-contiguously in (shard, id) order and cut the token stream of
    * each shard into fixed-`capacity` training sequences. Returns one row
    * per document: its shard, its token offset within the shard stream,
    * and the first/last sequence index it lands in (a document spans
    * `end_seq - begin_seq + 1` sequences; the dataloader re-reads it for
    * each).
    *
    * `shard = id % shards` keeps the layout reproducible under any
    * engine; the per-shard running offset is a window sum ordered by id —
    * each shard is an independent sorted partition, so shard count IS the
    * parallelism (use thousands of shards at 100 TB; sequence indices are
    * per-shard, exactly like per-worker dataloader files).
    */
  def packSequences(
      df: DataFrame, idCol: String, tokensCol: Column,
      capacity: Long, shards: Int): DataFrame = {
    require(capacity >= 1 && shards >= 1, "capacity and shards must be >= 1")
    val id = col(idCol)
    val w = Window.partitionBy(col("shard")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(id, pmod(id, lit(shards.toLong)).as("shard"), tokensCol.as("n_tok"))
      .withColumn("tok_offset", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(id, col("shard"), col("n_tok"), col("tok_offset"),
        (col("tok_offset") / capacity).cast("long").as("begin_seq"),
        ((col("tok_offset") + greatest(col("n_tok"), lit(1L)) - 1L) / capacity)
          .cast("long").as("end_seq"))
  }

  /** The dataloader-facing view of [[packSequences]]: one row per
    * (shard, sequence) with the number of contributing documents and the
    * token fill. Every sequence except each shard's tail is exactly
    * `capacity` tokens — the invariant a training job relies on. Derived
    * by exploding each document's sequence span and summing interval
    * overlaps; one shuffle on (shard, seq).
    */
  def packManifest(
      df: DataFrame, idCol: String, tokensCol: Column,
      capacity: Long, shards: Int): DataFrame = {
    val packed = packSequences(df, idCol, tokensCol, capacity, shards)
    packed
      .select(col("shard"), col("tok_offset"), col("n_tok"),
        explode(sequence(col("begin_seq"), col("end_seq"))).as("seq"))
      .withColumn("fill",
        least(col("tok_offset") + col("n_tok"), (col("seq") + 1) * capacity) -
          greatest(col("tok_offset"), col("seq") * capacity))
      .groupBy(col("shard"), col("seq"))
      .agg(count(lit(1)).as("n_docs"), sum(col("fill")).as("fill_tokens"))
  }

  /** Overlapping token-window chunking — the retrieval/RAG and
    * long-context prep step: cut each document's word stream into windows
    * of `chunk` tokens starting every `stride` tokens (overlap =
    * `chunk − stride`). Emits one row per (doc, window) with the window
    * index, token offset, token count and the chunk text. A window
    * starts at every multiple of `stride` below the doc length, so tail
    * windows may be short but every token is covered; empty docs emit
    * nothing.
    *
    * Scale shape: a pure row-local transform (sequence + explode over
    * each row's own word array) — zero shuffles, embarrassingly parallel,
    * and fully inside whole-stage codegen.
    */
  def chunkDocuments(
      df: DataFrame, textCol: String, idCol: String,
      chunk: Int, stride: Int): DataFrame = {
    require(chunk >= 1 && stride >= 1 && stride <= chunk,
      s"need 1 <= stride <= chunk, got chunk=$chunk stride=$stride")
    val id = col(idCol)
    df.select(id, words(col(textCol)).as("w"))
      // the tokenizer maps the empty/all-space doc to [""] (split
      // parity) — such docs have no chunkable content and emit nothing
      .where(size(col("w")) > 1 || element_at(col("w"), 1) =!= "")
      .select(id, col("w"),
        explode(sequence(lit(0),
          floor((size(col("w")) - 1) / lit(stride)).cast("int"))).as("chunk_idx"))
      .select(id, col("chunk_idx"),
        (col("chunk_idx") * stride).cast("long").as("start_tok"),
        least(lit(chunk), size(col("w")) - col("chunk_idx") * stride)
          .cast("long").as("n_tok"),
        array_join(slice(col("w"), col("chunk_idx") * stride + 1,
          least(lit(chunk), size(col("w")) - col("chunk_idx") * stride)), " ")
          .as("chunk_text"))
  }

  /** Top-`k` corpus vocabulary by term frequency (count desc, term asc) —
    * the tokenizer-training / vocab-pruning primitive. The global top-k
    * rides [[BoundedTopK]] (k-row map-side partials, count-as-double is
    * exact below 2⁵³), never a full sort of the term table.
    */
  def topVocabulary(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.select(explode(words(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .agg(BoundedTopK.topK(
        struct(col("cnt").cast("double").as("key"), col("term"), col("cnt")), k).as("top"))
      .select(posexplode(col("top")).as(Seq("i", "r")))
      .select((col("i") + 1).as("rnk"), col("r.term").as("term"), col("r.cnt").as("cnt"))
  }

  /** Deterministic release export with an integrity manifest — the last
    * mile of a dataset drop: the corpus lands as `shards` hash-assigned
    * parquet partitions under `path` (one pass, `partitionBy`), and the
    * returned manifest carries per shard
    * `(shard, n_rows, n_tokens, content_sig)` where `content_sig` is the
    * BIT_XOR of each row's `stringHash64(id || \\u0001 || text)` —
    * order-free, partitioning-free, overflow-free, so a consumer (or a
    * different engine) re-reading the shards can verify both membership
    * and content byte-for-byte without any canonical ordering.
    *
    * Scale shape: shard assignment is a row-local hash; the export is
    * ONE `partitionBy` write (no per-shard rescans) and the manifest ONE
    * partial-aggregable groupBy with three counters — two corpus passes
    * total.
    */
  def exportShards(
      df: DataFrame, idCol: String, textCol: String,
      path: String, shards: Int, seed: Long = 0L): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val id = col(idCol)
    val withShard = df.select(id, col(textCol),
      pmod(Sketches.splitmixLong(id.cast("long").bitwiseXOR(lit(seed))),
        lit(shards.toLong)).cast("int").as("shard"),
      Sketches.stringHash64(
        concat_ws("\u0001", id.cast("string"), col(textCol)), seed).as("__rh"),
      size(words(col(textCol))).cast("long").as("__ntok"))
    withShard.drop("__rh", "__ntok")
      .write.partitionBy("shard").mode("overwrite").parquet(path)
    withShard.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__ntok")).as("n_tokens"),
        expr("bit_xor(__rh)").as("content_sig"))
  }

  /** Content-defined chunking ([[graft.functions.CdcChunks]]): one row
    * per chunk with (chunk_idx, start, len, chunk_text). Boundaries are
    * local-content hashes, so an edit re-chunks only the chunk it lands
    * in — the storage-dedup segmentation (LBFS/FastCDC family) that
    * fixed-width chunking can't give (one inserted byte shifts every
    * downstream boundary). Row-local explode — zero shuffles; expected
    * chunk length 2^maskBits code points.
    */
  def cdcChunkDocuments(
      df: DataFrame, textCol: String, idCol: String,
      maskBits: Int = 5): DataFrame = {
    val id = col(idCol)
    df.select(id, col(textCol).as("__t"),
        posexplode(graft.functions.CdcChunks.cdcChunks(col(textCol), maskBits))
          .as(Seq("chunk_idx", "c")))
      .select(id, col("chunk_idx").cast("int").as("chunk_idx"),
        col("c.start").as("start"), col("c.len").as("len"),
        expr("substring(__t, c.start, c.len)").as("chunk_text"))
  }

  /** Vocabulary coverage / OOV rate against a fixed vocabulary table —
    * the tokenizer-fit audit ("how much of the corpus does this vocab
    * actually cover?") run before committing to a tokenizer: per doc,
    * total whitespace tokens, how many are in `vocab`, and the OOV rate.
    * Docs whose text yields zero tokens produce no row (the
    * [[unigramSurprisal]] convention).
    *
    * Scale shape: the vocabulary is broadcast into the exploded token
    * stream (vocabularies are ≤ millions of rows — broadcast-sized by
    * construction), then ONE partial-aggregable groupBy on the doc id.
    * The corpus shuffles once, keyed by id, carrying two counters.
    */
  def vocabCoverage(
      df: DataFrame, textCol: String, idCol: String,
      vocab: DataFrame, termCol: String = "term"): DataFrame = {
    val id = col(idCol)
    val v = vocab.select(col(termCol).as("__vterm")).distinct()
    df.select(id, explode(words(col(textCol))).as("__tok"))
      .join(broadcast(v), col("__tok") === col("__vterm"), "left")
      .groupBy(id)
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        count(col("__vterm")).cast("long").as("n_in_vocab"))
      .withColumn("oov_rate",
        round((col("n_tokens") - col("n_in_vocab")).cast("double") /
          col("n_tokens").cast("double"), 6))
  }

  /** Weighted sampling WITHOUT replacement, per group — the
    * quality-weighted cousin of [[sampleByGroup]] (Efraimidis &
    * Spirakis 2006 A-ES keys): each row draws u uniform from
    * splitmix64(id ⊕ seed) and ranks by `ln(u) / w` (⇔ u^(1/w)); the k
    * best per group are an exact weighted sample without replacement —
    * "keep the k best-weighted docs per domain, at random but favoring
    * quality". Deterministic: u is hash-derived, the key is quantized
    * once to integer micro-units (ties break id-asc in the bounded
    * heap), so any engine replays the exact keep set. Weights must be
    * > 0 — violations raise rather than silently skewing the sample.
    *
    * Scale shape: key computation is row-local; per-group top-k is the
    * bounded-heap aggregate (k-row map-side partials) — one shuffle of
    * k-row states per group, never a window.
    */
  def sampleWeightedByGroup(
      df: DataFrame, groupCol: String, idCol: String, weightCol: Column,
      k: Int, seed: Long = 0L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val grp = col(groupCol)
    val id = col(idCol)
    val w = weightCol.cast("double")
    val wChecked = when(w.isNull || !(w > 0.0),
      raise_error(concat(lit("sampleWeightedByGroup: weight must be > 0 for id "),
        id.cast("string"))).cast("double")).otherwise(w)
    val u = (shiftrightunsigned(
        Sketches.splitmixLong(id.cast("long").bitwiseXOR(lit(seed))), 11)
        .cast("double") + lit(0.5)) / lit(9007199254740992.0 /* 2^53 */)
    val key = floor(lit(1e6) * (log(u) / wChecked) + lit(0.5)).cast("long")
    df.select(grp, id, key.as("samp_key"))
      .groupBy(grp)
      .agg(BoundedTopK.topK(
        struct(col("samp_key").cast("double").as("s"), id, col("samp_key")), k)
        .as("top"))
      .select(grp, explode(col("top")).as("t"))
      .select(grp, col(s"t.$idCol").as(idCol), col("t.samp_key").as("samp_key"))
  }

  /** Deterministic uniform sample of `k` rows per group: keep the k
    * members with the largest `splitmix64(id)` (as double, id-asc
    * tiebreak — the same replayable order [[SimilaritySearch]] uses for
    * centroid training samples). Hash order is uniform in expectation, so
    * this is a without-replacement uniform sample that any engine can
    * reproduce — unlike `TABLESAMPLE`, which is partition-layout
    * dependent.
    *
    * Aggregation state is a k-row bounded heap per group with map-side
    * partials ([[BoundedTopK]]) — a group's full membership is never
    * buffered, so a 10-billion-row source with one hot group still
    * shuffles only k rows per (partition, group).
    */
  def sampleByGroup(
      df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    val picked = df
      .select(col(groupCol), col(idCol))
      .withColumn("hk", Sketches.splitmixLong(col(idCol)).cast("double"))
      .groupBy(col(groupCol))
      .agg(BoundedTopK.topK(struct(col("hk"), col(idCol)), k).as("top"))
      .select(col(groupCol), explode(col(s"top.$idCol")).as(idCol))
    df.join(picked, Seq(groupCol, idCol), "left_semi")
  }

  /** Deterministic global shuffle + reshard — the "epoch shuffle" a
    * training dataloader needs: a reproducible uniform permutation of the
    * corpus, materialized as (shard, position-in-shard, global position).
    * Concatenating shards in shard order reads the corpus in exactly the
    * permutation `splitmix64(id ⊕ seed)` ascending (id-asc tiebreak) —
    * change `seed` per epoch for a fresh permutation, and any engine (or
    * a later re-run) reproduces the same order bit for bit. Unlike
    * `ORDER BY rand()` there is no RNG state and no partition-layout
    * dependence.
    *
    * Scale shape (same two-pass layout as [[tokenBudget]]): shard = the
    * top hash bits (monotone in the hash order), so the within-shard
    * `row_number` window partitions by shard — parallelism = shard count,
    * and no task holds more than one shard. Global positions come from a
    * ≤`shards`-row offset frame (per-shard counts, broadcast back); the
    * corpus itself shuffles once, on the shard key.
    */
  def shuffleShards(
      df: DataFrame, idCol: String, shards: Int, seed: Long = 0L): DataFrame = {
    require(shards >= 2 && (shards & (shards - 1)) == 0,
      s"shards must be a power of two >= 2, got $shards")
    val shift = 64 - Integer.numberOfTrailingZeros(shards)
    val id = col(idCol)
    val withHk = df.select(id,
        Sketches.splitmixLong(id.cast("long").bitwiseXOR(lit(seed))).as("__hk"))
      // arithmetic >> keeps signed order, so shard id is monotone in hk
      .withColumn("shard", (shiftright(col("__hk"), shift) + lit(shards / 2)).cast("int"))
    val wS = Window.orderBy(col("shard")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withHk.groupBy(col("shard"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset", coalesce(sum(col("__cnt")).over(wS), lit(0L)))
      .select(col("shard"), col("__offset"))
    val wIn = Window.partitionBy(col("shard")).orderBy(col("__hk"), id)
    withHk.join(broadcast(offsets), "shard")
      .withColumn("pos", row_number().over(wIn).cast("long") - 1L)
      .select(id, col("shard"), col("pos"), (col("__offset") + col("pos")).as("global_pos"))
  }

  /** Deterministic mixture interleave — stride scheduling of several
    * corpora into ONE training order: source `s` with integer weight
    * `w_s` occupies a `w_s`-proportional share of every prefix of the
    * output (the "data mixing" step between per-domain selection and the
    * epoch shuffle). Each source's rows are taken in their seeded
    * splitmix hash order (index j), assigned the rational stride key
    * `(j + ½) / w_s`, and the global order is that key ascending with
    * exact cross-multiplied integer comparisons — key ties (inevitable
    * for equal weights) break by the position of the source in `weights`,
    * then within a source keys are distinct. Rows whose source is not
    * listed in `weights` are excluded.
    *
    * Scale shape: one shuffle total (the per-source hash-order indexing,
    * bucketed two-pass exactly like [[tokenBudget]]: parallelism =
    * sources × `indexBuckets`, offset frame broadcast). The interleaved
    * GLOBAL position is then computed analytically per row — for each
    * other source, the number of its keys strictly below ours is a
    * closed-form integer division, and the per-source row counts ride in
    * as one broadcast map — so the merge itself costs zero shuffles and
    * zero sorts, and any engine replays it bit for bit (the oracle
    * instead sorts by the cross-multiplied integer key — two independent
    * formulations, one order). Shards are contiguous `global_pos` ranges
    * (`floor(g·shards/N)`), so concatenating shards in order replays the
    * schedule.
    *
    * Integer-overflow headroom: the formulas multiply a row's odd key
    * `2j+1` by another source's weight — fine for corpora to ~10¹⁴ rows
    * with weights to ~10³ (< 2⁶³).
    */
  def interleaveMixture(
      df: DataFrame, sourceCol: String, idCol: String,
      weights: Seq[(String, Long)], shards: Int,
      seed: Long = 0L, indexBuckets: Int = 64): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be non-empty positive integers, got $weights")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate source in weights: $weights")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    require(indexBuckets >= 2 && (indexBuckets & (indexBuckets - 1)) == 0,
      s"indexBuckets must be a power of two >= 2, got $indexBuckets")
    val shift = 64 - Integer.numberOfTrailingZeros(indexBuckets)
    val id = col(idCol)
    def esc(s: String) = s.replace("'", "''")

    val hk = seededHashKey(df, idCol, seed)
    val base = df
      .where(col(sourceCol).isin(weights.map(_._1): _*))
      .select(col(sourceCol).as("__src"), id, hk.as("__hk"))
      .withColumn("__bkt",
        (shiftright(col("__hk"), shift) + lit(indexBuckets / 2)).cast("int"))
    // per-(source, bucket) start offsets; the frame is sources×buckets
    // rows — driver-small, broadcast back
    val wB = Window.partitionBy(col("__src")).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("__src"), col("__bkt"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wB), lit(0L)))
      .select(col("__src"), col("__bkt"), col("__off"))
    val wIn = Window.partitionBy(col("__src"), col("__bkt"))
      .orderBy(col("__hk"), id)
    // per-source totals as ONE broadcast map row (no driver action)
    val countsRow = base.groupBy(col("__src")).agg(count(lit(1)).as("__n"))
      .agg(map_from_entries(collect_list(struct(col("__src"), col("__n"))))
        .as("__nmap"))

    val ownW = weights.foldLeft(lit(null).cast("long")) {
      case (acc, (s, w)) => when(col("__src") === s, lit(w)).otherwise(acc)
    }
    val ownIdx = weights.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, ((s, _), i)) => when(col("__src") === s, lit(i)).otherwise(acc)
    }
    val indexed = base
      .join(broadcast(offsets), Seq("__src", "__bkt"))
      .withColumn("source_pos",
        col("__off") + row_number().over(wIn).cast("long") - 1L)
      .withColumn("__k", col("source_pos") * 2L + 1L)
      .withColumn("__w", ownW)
      .withColumn("__oidx", ownIdx)
      .crossJoin(broadcast(countsRow))

    // analytic rank: for each source s' (static list), how many of its
    // keys (2j'+1)/(2w') sort strictly below ours — plus the exact-tie
    // row when it exists and s' precedes ours in the weights order
    val withNs = weights.zipWithIndex.foldLeft(indexed) {
      case (acc, ((s, _), i)) => acc.withColumn(s"__n_$i",
        coalesce(element_at(col("__nmap"), lit(s)), lit(0L)))
    }
    val contribs = weights.zipWithIndex.map { case ((s, w), i) =>
      expr(
        s"""CASE WHEN __src = '${esc(s)}' THEN source_pos ELSE
           |  least(__n_$i, (__k * ${w}L + __w - 1) div (__w * 2)) +
           |  (CASE WHEN ((__k * ${w}L) % (__w * 2)) = __w
           |     AND $i < __oidx
           |     AND ((__k * ${w}L - __w) div (__w * 2)) < __n_$i
           |   THEN 1 ELSE 0 END)
           |END""".stripMargin)
    }
    val nTotal = weights.indices.map(i => col(s"__n_$i")).reduce(_ + _)
    withNs
      .withColumn("global_pos", contribs.reduce(_ + _).cast("long"))
      .withColumn("__ntot", nTotal)
      .withColumn("shard",
        expr(s"(global_pos * ${shards}L) div __ntot").cast("int"))
      .withColumn("pos",
        col("global_pos") - expr(s"(shard * __ntot + ${shards}L - 1) div ${shards}L"))
      .select(id, col("__src").as(sourceCol), col("source_pos"),
        col("global_pos"), col("shard"), col("pos"))
  }

  /** Bigram-interpolated surprisal — the context-sensitive upgrade of
    * [[unigramSurprisal]] (the cheap end of CCNet-style LM-perplexity
    * filtering): per document, the mean over token positions i ≥ 2 of
    * −ln( λ·p̂(wᵢ|wᵢ₋₁) + (1−λ)·p̂(wᵢ) ) under the corpus's own counts.
    * Fluent, corpus-typical text scores low; shuffled or off-distribution
    * word soup scores high even when its individual words are common —
    * which is exactly what the unigram score cannot see.
    *
    * Determinism contract: each bigram TYPE's surprisal is quantized to
    * integer micro-nats once (`floor(1e6·x + 0.5)`, the [[importanceResample]]
    * discipline), so per-doc totals are exact integer sums immune to float
    * fold order; the emitted mean is the integer division `sum div n`.
    * Docs with fewer than two words have no bigram and are absent.
    *
    * Scale shape: counts and the per-type weight table are vocabulary- /
    * bigram-vocabulary-sized (shuffled on their term keys — the canonical
    * word-count layout; AQE broadcasts them when small, and nothing here
    * requires a broadcast). The token stream itself shuffles twice: once
    * into per-(doc, bigram-type) counts, once joining those to the weight
    * table — never into a per-doc window.
    */
  def bigramSurprisal(
      df: DataFrame, textCol: String, idCol: String,
      lambda: Double = 0.7): DataFrame = {
    require(lambda > 0.0 && lambda <= 1.0, s"lambda must be in (0, 1], got $lambda")
    val id = col(idCol)
    val ws = words(col(textCol))

    val tokens = df.select(id, explode(ws).as("term"))
    val uni = tokens.groupBy(col("term")).agg(count(lit(1)).as("uc"))
    // corpus token total as a broadcast scalar (one row, lazy plan)
    val total = uni.agg(sum(col("uc")).cast("double").as("__tot"))

    // per-(doc, bigram-type) occurrence counts: positions 2..n as
    // (prev, cur) pairs via a row-local transform, then one aggregation
    val docPairs = df.select(id, ws.as("w"))
      .where(size(col("w")) >= 2)
      .select(id, explode(transform(sequence(lit(2), size(col("w"))),
        i => struct(element_at(col("w"), i - 1).as("prev"),
          element_at(col("w"), i).as("cur")))).as("p"))
      .select(id, col("p.prev").as("prev"), col("p.cur").as("cur"))
      .groupBy(id, col("prev"), col("cur")).agg(count(lit(1)).as("m"))

    val bc = docPairs.groupBy(col("prev"), col("cur")).agg(sum(col("m")).as("bc"))
    // one integer weight per bigram TYPE (bigram-vocab-sized, computed once)
    val typeScore = bc
      .join(uni.select(col("term").as("prev"), col("uc").as("pc")), "prev")
      .join(uni.select(col("term").as("cur"), col("uc").as("cc")), "cur")
      .crossJoin(broadcast(total))
      .select(col("prev"), col("cur"),
        floor(lit(1e6) * -log(
          lit(lambda) * (col("bc").cast("double") / col("pc").cast("double")) +
            lit(1.0 - lambda) * (col("cc").cast("double") / col("__tot"))) + 0.5)
          .cast("long").as("micro"))

    docPairs.join(typeScore, Seq("prev", "cur"))
      .groupBy(id)
      .agg(sum(col("m")).as("n_bigrams"),
        sum(col("m") * col("micro")).as("__sum_micro"))
      .select(id, col("n_bigrams"),
        expr("__sum_micro div n_bigrams").as("surprisal_micro"))
  }

  /** Interpolated Kneser-Ney bigram surprisal — the KenLM-family quality
    * scorer (Kneser & Ney 1995; Chen & Goodman 1999 interpolated form):
    * per-doc mean −ln p_KN(w|v) with
    * `p_KN(w|v) = max(c(v,w) − D, 0)/c(v) + D·N1+(v,·)/c(v) · N1+(·,w)/N1+(··)`
    * — absolute discounting plus the continuation-probability backoff
    * that plain interpolation ([[bigramSurprisal]]) lacks ("york" is
    * frequent but only ever follows "new"; KN scores it accordingly).
    *
    * Exactness: with the discount a quarter-integer D = q/4, the
    * probability is the INTEGER rational
    * `[max(4c−q, 0)·T + q·N1v·N1w] / (4·c(v)·T)` (T = bigram type
    * count), so the only transcendental is one `ln` per bigram TYPE,
    * quantized to micro-nats (`floor(1e6·x + 0.5)`) before the exact
    * integer per-doc sums — the [[bigramSurprisal]] replay convention.
    *
    * Scale shape: same as [[bigramSurprisal]] — type tables shuffle on
    * term keys (canonical word-count shape), N1+ tables are grouped
    * aggregates of the type table, T is a one-row broadcast, the token
    * stream never windows.
    */
  def knSurprisal(
      df: DataFrame, textCol: String, idCol: String,
      discountQuarters: Int = 3): DataFrame = {
    require(discountQuarters >= 1 && discountQuarters <= 3,
      s"discount D = q/4 needs q in [1, 3], got $discountQuarters")
    val q = discountQuarters
    val id = col(idCol)
    val ws = words(col(textCol))

    val docPairs = df.select(id, ws.as("w"))
      .where(size(col("w")) >= 2)
      .select(id, explode(transform(sequence(lit(2), size(col("w"))),
        i => struct(element_at(col("w"), i - 1).as("prev"),
          element_at(col("w"), i).as("cur")))).as("p"))
      .select(id, col("p.prev").as("prev"), col("p.cur").as("cur"))
      .groupBy(id, col("prev"), col("cur")).agg(count(lit(1)).as("m"))

    val bc = SessionCaches.register(
      docPairs.groupBy(col("prev"), col("cur")).agg(sum(col("m")).as("bc")))
    // context mass + follower diversity per prev; predecessor diversity
    // per cur; bigram type total as a one-row broadcast
    val ctx = bc.groupBy(col("prev"))
      .agg(sum(col("bc")).as("cv"), count(lit(1)).as("n1v"))
    val pred = bc.groupBy(col("cur")).agg(count(lit(1)).as("n1w"))
    val types = bc.agg(count(lit(1)).as("__tt"))

    val typeScore = bc
      .join(ctx, "prev").join(pred, "cur")
      .crossJoin(broadcast(types))
      .select(col("prev"), col("cur"),
        floor(lit(1e6) * -log(
          (greatest(lit(4L) * col("bc") - lit(q.toLong), lit(0L)) * col("__tt") +
            lit(q.toLong) * col("n1v") * col("n1w")).cast("double") /
            (lit(4L) * col("cv") * col("__tt")).cast("double")) + 0.5)
          .cast("long").as("micro"))

    docPairs.join(typeScore, Seq("prev", "cur"))
      .groupBy(id)
      .agg(sum(col("m")).as("n_bigrams"),
        sum(col("m") * col("micro")).as("__sum_micro"))
      .select(id, col("n_bigrams"),
        expr("__sum_micro div n_bigrams").as("kn_micro"))
  }

  /** Gopher-style composite document filter (Rae et al. §A1.1 shape):
    * every rule is a row-local codegen'd expression — no shuffle, no UDF
    * — and each document gets a `passed` flag plus a comma-joined
    * `reasons` string naming every failed rule (an auditable filter: at
    * 100 TB you keep the reasons column and aggregate WHY the corpus
    * shrank, instead of diffing opaque before/after counts).
    */
  def gopherFilter(
      df: DataFrame, textCol: String, idCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minAvgWordLen: Double = 3.0, maxAvgWordLen: Double = 10.0,
      maxWordRep: Double = 0.6, maxPunctRatio: Double = 0.3): DataFrame = {
    val t = col(textCol)
    val ws = words(t)
    val nWords = size(ws).cast("double")
    val avgLen = length(regexp_replace(t, "\\s+", "")).cast("double") /
      greatest(nWords, lit(1.0))
    val wordRep = lit(1.0) - size(array_distinct(ws)).cast("double") /
      greatest(nWords, lit(1.0))
    val punct = regexp_count(t, lit("[^\\p{L}0-9\\s]")).cast("double") /
      greatest(length(t).cast("double"), lit(1.0))
    val rules = Seq(
      (nWords < minWords, "too_short"),
      (nWords > maxWords, "too_long"),
      (avgLen < minAvgWordLen, "words_too_short"),
      (avgLen > maxAvgWordLen, "words_too_long"),
      (wordRep > maxWordRep, "too_repetitive"),
      (punct > maxPunctRatio, "too_much_punct"))
    val reasons = filter(
      array(rules.map { case (cond, name) =>
        when(cond, lit(name)).otherwise(lit(null).cast("string"))
      }: _*),
      x => x.isNotNull)
    df.withColumn("reasons", array_join(reasons, ","))
      .withColumn("passed", col("reasons") === "")
  }

  /** Unigram-surprisal quality score: average −ln p(word) per document
    * under the corpus's own unigram distribution — the cheap end of the
    * perplexity-filtering family (docs full of corpus-typical words score
    * low; gibberish and off-distribution docs score high and get cut).
    *
    * Two aggregations (term counts, per-doc mean) plus a broadcast join
    * of the vocabulary — the vocabulary is broadcast-sized for any real
    * corpus, and the token stream itself never shuffles twice.
    */
  def unigramSurprisal(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val id = col(idCol)
    val tokens = df.select(id, explode(words(col(textCol))).as("term"))
    val freq = tokens.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    // vocabulary total as a broadcast scalar (one row) — one lazy plan,
    // no job during construction (the q_scalar_subquery pattern)
    val total = freq.agg(sum(col("cnt")).cast("double").as("__vocab_total"))
    tokens.join(broadcast(freq), "term")
      .crossJoin(broadcast(total))
      .groupBy(id)
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        round(avg(-log(col("cnt").cast("double") / col("__vocab_total"))), 4).as("surprisal"))
  }

  /** Deterministic Bernoulli thinning at a per-row rate (dataset mixture
    * weighting: keep source s at rate w_s). A row survives iff the top 53
    * bits of `splitmix64(id)` fall below `rate · 2^53` — the comparison
    * is a single long compare against an IEEE-exact threshold (2^53 fits
    * the double mantissa), so any engine replays the exact keep set:
    * no RNG state, no partition-layout dependence, stable across reruns
    * and engines. Expected survival = rate; selection is per-id
    * independent (hash uniformity).
    */
  def sampleMixture(df: DataFrame, idCol: String, rate: Column): DataFrame =
    df.where(
      shiftrightunsigned(Sketches.splitmixLong(col(idCol)), 11) <
        (rate * lit(9007199254740992.0 /* 2^53 */)).cast("long"))

  /** Deterministic train/validation/test split assignment — the
    * dataset-release primitive: every document lands in exactly one named
    * split, with split shares equal to the requested fractions in
    * expectation, and the assignment is a pure function of (id, seed) —
    * stable across reruns, engines, partition layouts, and corpus
    * growth (adding documents never moves an existing one between
    * splits, unlike sort/limit-based splitting).
    *
    * Mechanics (the [[sampleMixture]] convention): u = top 53 bits of
    * splitmix64(id ⊕ seed) is uniform on [0, 2^53); split i wins iff
    * u < floor(cum_i · 2^53) and no earlier split matched. Thresholds
    * are exact longs computed once on the driver, so any engine replays
    * the assignment with a single integer compare chain. Fractions must
    * sum to 1 (±1e-9); the last split absorbs the floor remainder.
    *
    * Scale shape: row-local hash + compare — zero shuffles, zero state,
    * whole-stage codegen. The 100 TB story is trivial by construction.
    */
  def assignSplits(
      df: DataFrame, idCol: String, splits: Seq[(String, Double)],
      seed: Long = 0L, outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 > 0.0), s"fractions must be > 0: $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"split names must be distinct: ${splits.map(_._1)}")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"fractions must sum to 1, got $total")
    val names = splits.map(_._1)
    val thresholds = splits.map(_._2).scanLeft(0.0)(_ + _).tail.init
      .map(c => math.floor(c * 9007199254740992.0 /* 2^53 */).toLong)
    val u = shiftrightunsigned(seededHashKey(df, idCol, seed), 11)
    val assign =
      if (thresholds.isEmpty) lit(names.head)
      else {
        val first = when(u < lit(thresholds.head), lit(names.head))
        thresholds.tail.zip(names.tail.init).foldLeft(first) {
          case (acc, (t, n)) => acc.when(u < lit(t), lit(n))
        }.otherwise(lit(names.last))
      }
    df.withColumn(outCol, assign)
  }

  /** Temperature-based class rebalancing — the multilingual/topic-cluster
    * sampling step of a pretraining mixture (the XLM-R / mC4 recipe):
    * classes (languages, clusters, domains) are kept at rates making the
    * SAMPLED class shares ∝ n_c^alpha, flattening the head and boosting
    * the tail as alpha → 0 (alpha = 1 keeps natural proportions). The
    * overall kept fraction targets `targetFraction` of the corpus
    * (per-class rates clamp at 1, so very small classes can cap the
    * achievable boost). Selection is the [[sampleMixture]] deterministic
    * thinning at the class's derived rate — replayable in any engine.
    *
    * Determinism contract (the DSIR convention): the only transcendental,
    * `pow(n_c, alpha)`, is INTEGER-quantized per class
    * (`floor(1e6·n_c^alpha + 0.5)`) BEFORE the cross-class sum, so the
    * normalizer is an order-free integer sum (a float Σ over classes
    * would fold in partition order and 1-ulp-flip thresholds between
    * engines); the rate arithmetic on those exact integers is
    * fixed-op-order, and the keep threshold floors to a long on both
    * sides (DuckDB CAST rounds; `floor` on both replays exactly).
    * Quantization headroom: 1e6·n^alpha must stay under 2^53 — holds to
    * corpus sizes of 10¹² docs for alpha ≤ 0.9.
    *
    * Scale shape: one partial-agg groupBy for the class histogram (≤
    * classes rows), a one-row totals frame, rates broadcast back, and a
    * row-local hash filter — the corpus shuffles zero times.
    */
  def temperatureSample(
      df0: DataFrame, classCol: String, idCol: String,
      alpha: Double, targetFraction: Double, seed: Long = 0L): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(targetFraction > 0.0 && targetFraction <= 1.0,
      s"targetFraction must be in (0, 1], got $targetFraction")
    // NULL-class rows are excluded consistently: an equi-join never
    // matches null keys, so leaving them in the histogram would deflate
    // every real class's rate (phantom mass in the normalizer) while the
    // rows themselves silently vanish — drop them from BOTH sides up
    // front instead (callers bucket unknowns into a sentinel class if
    // they want them sampled)
    val df = df0.where(col(classCol).isNotNull)
    // persisted: the ≤classes-row histogram is consumed by both the
    // totals frame and the rates join — without the persist each
    // consumer re-runs the full-corpus groupBy scan (the DSIR
    // histogram-frame precedent; CacheManager reuses one entry across
    // re-invocations of the same plan)
    val counts = SessionCaches.register(df.groupBy(col(classCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__qp",
        floor(pow(col("__n").cast("double"), alpha) * 1e6 + 0.5).cast("long")))
    val totals = counts.agg(
      sum(col("__n")).as("__tot_n"), sum(col("__qp")).as("__tot_qp"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col(classCol),
        least(lit(1.0),
          lit(targetFraction) * col("__tot_n").cast("double") * col("__qp").cast("double") /
            (col("__tot_qp").cast("double") * col("__n").cast("double"))).as("__rate"))
    val hk = seededHashKey(df, idCol, seed)
    df.join(broadcast(rates), Seq(classCol))
      .where(shiftrightunsigned(hk, 11) <
        floor(col("__rate") * lit(9007199254740992.0 /* 2^53 */)))
      .withColumn("keep_rate", round(col("__rate"), 6))
      .drop("__rate")
  }

  /** Snapshot diff between two corpus versions keyed by `idCol` — the
    * dataset-release audit: which documents were added, removed, or
    * changed (normalized-content fingerprint differs) between v1 and
    * v2. Returns one row per differing id, `(id, status)` with status ∈
    * added | removed | changed; unchanged ids are dropped (the common
    * case at 100 TB — emit only the delta).
    *
    * Scale shape: each side reduces to (id, 64-bit fp) row-locally, the
    * full-outer join is ONE shuffle on the id key — and zero shuffles
    * when both snapshots are id-bucketized kv tables read through the
    * catalog ([[graft.operators.KvMerge.bucketize]]); the status
    * computation is row-local.
    */
  def snapshotDiff(
      oldDf: DataFrame, newDf: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // explicit row-existence markers: a NULL-text doc has a NULL
    // fingerprint, so fp nullness cannot double as "row absent" — a doc
    // present in both snapshots with NULL text must compare as
    // unchanged, not as added/removed
    val o = oldDf.select(col(idCol).as("id"),
      TextFunctions.fingerprint64(col(textCol)).as("__fp_old"),
      lit(true).as("__in_old"))
    val n = newDf.select(col(idCol).as("id"),
      TextFunctions.fingerprint64(col(textCol)).as("__fp_new"),
      lit(true).as("__in_new"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(not(col("__fp_old") <=> col("__fp_new")), "changed"))
      .where(col("status").isNotNull)
      .select(col("id"), col("status"))
  }

  /** PII scrub: replace emails, dotted-quad IPs and NNN-NNN-NNNN phone
    * numbers with typed placeholder tags, and count each. The regexes are
    * deliberately in the common RE2/Java subset so results replay
    * identically in any engine (see [[TextFunctions.redactPii]]).
    */
  def scrubPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails", TextFunctions.piiEmailCount(col(textCol)))
      .withColumn("n_ips", TextFunctions.piiIpCount(col(textCol)))
      .withColumn("n_phones", TextFunctions.piiPhoneCount(col(textCol)))
      .withColumn(textCol, TextFunctions.redactPii(col(textCol)))

  /** DSIR-style importance resampling: select `k` documents from `raw`
    * with probability ∝ exp(importance weight), where the weight is the
    * hashed-bigram log-likelihood ratio between a (small) `target`
    * domain corpus and the raw corpus (Xie et al., NeurIPS 2023 — the
    * standard "make 100 TB of crawl look like the target domain"
    * pretraining selection step).
    *
    * Determinism contract (exact cross-engine replay, no RNG state):
    *  - per-bucket weights are INTEGER-quantized,
    *    `floor(1e6·(ln p̂_target(b) − ln p̂_raw(b)) + 0.5)` with
    *    Laplace-smoothed bucket probabilities `(c_b+1)/(T+B)` — per-doc
    *    scores are exact integer sums, immune to float fold order;
    *  - sampling-without-replacement is Gumbel top-k: the per-doc key is
    *    `score + floor(1e6·gumbel + 0.5)` with the Gumbel noise
    *    `−ln(−ln u)` derived from `splitmix64(id ⊕ seed)` mapped to an
    *    exact-dyadic u ∈ (0,1) — the engine-replayable analogue of
    *    categorical sampling ∝ exp(score).
    *
    * Scale shape: two passes over `raw` (bucket histogram, then scoring)
    * — the DSIR minimum. The histogram aggregations partial-combine
    * map-side into ≤`buckets` rows each; the weight table is one
    * broadcast row (a dense `buckets`-long array, ~8·B bytes); scoring
    * is row-local against that broadcast (zero shuffle); selection is a
    * [[BoundedTopK]] global aggregate (k-row map-side partials), not a
    * sort. Nothing anywhere holds more than `max(buckets, k)` rows of
    * state.
    */
  def importanceResample(
      raw: DataFrame, target: DataFrame, textCol: String, idCol: String,
      k: Int, buckets: Int = 1024, seed: Long = 0x7a5a0d51e5a3b1c9L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val id = col(idCol)

    // hashed unigram+bigram buckets, one imperative eval per doc
    // ([[Sketches.FeatureBucketsExpr]]); edge empty tokens dropped so
    // empty/odd-whitespace docs featurize identically in any engine
    // (ws-split empties are a Java quirk)
    def featBuckets(text: Column): Column =
      Sketches.featureBuckets(
        filter(words(lower(text)), t => t =!= lit("")), buckets, seed)

    def bucketCounts(df: DataFrame, name: String): DataFrame =
      df.select(explode(featBuckets(col(textCol))).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as(name))

    val per = bucketCounts(target, "ct")
      .join(bucketCounts(raw, "cr"), Seq("b"), "full_outer")
      .select(col("b"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    // LAZY persist (no job at plan construction): the histogram frame is
    // ≤`buckets` rows but costs a full corpus pass, and it feeds THREE
    // consumers (the totals row twice, the per-bucket weight rows) —
    // without the cache Spark re-executes the corpus histogram per
    // consumer (shared subplans are not reused unless canonically-equal
    // Exchanges align; confirmed on the ANN family)
    SessionCaches.register(per)
    // corpus feature totals as a broadcast scalar (every feature lands in
    // exactly one bucket, so the bucket sums ARE the totals) — one lazy
    // plan, no job during construction
    val tot = per.agg(sum(col("ct")).cast("double").as("tt"),
      sum(col("cr")).cast("double").as("tr"))
    def lamOf(ct: Column, cr: Column): Column =
      floor(lit(1e6) *
        (log((ct.cast("double") + 1.0) / (col("tt") + buckets)) -
         log((cr.cast("double") + 1.0) / (col("tr") + buckets))) + 0.5).cast("long")
    // dense per-bucket weight array as ONE broadcast row; collect_list is
    // bounded by construction (≤ `buckets` rows reach it)
    val lamArr = per.crossJoin(broadcast(tot))
      .select(col("b"), lamOf(col("ct"), col("cr")).as("lam"))
      .agg(map_from_entries(collect_list(struct(col("b"), col("lam")))).as("m"))
      .crossJoin(broadcast(tot))
      .select(transform(sequence(lit(0), lit(buckets - 1)),
        b => coalesce(try_element_at(col("m"), b), lamOf(lit(0L), lit(0L))))
        .as("lam_arr"))

    // row-local scoring against the broadcast weight array, then the
    // Gumbel key; u = ((h >>> 11) + 0.5)·2⁻⁵³ is an exact dyadic in (0,1)
    val u = (shiftrightunsigned(seededHashKey(raw, idCol, seed), 11)
      .cast("double") + 0.5) * lit(math.pow(2.0, -53))
    raw.select(id, featBuckets(col(textCol)).as("fb"))
      .crossJoin(broadcast(lamArr))
      .select(id,
        aggregate(col("fb"), lit(0L),
          (acc, b) => acc + element_at(col("lam_arr"), b + 1)).as("score"))
      .withColumn("samp_key",
        col("score") + floor(lit(1e6) * -log(-log(u)) + 0.5).cast("long"))
      // BoundedTopK needs a leading double, but a long→double key alone
      // would collapse distinct keys above 2^53; long→double rounding is
      // MONOTONE, so (double desc, -key asc, id asc) == the exact
      // (key desc, id asc) order, and the emitted samp_key never
      // round-trips through the double
      .agg(BoundedTopK.topK(
        struct(col("samp_key").cast("double").as("key"),
          (-col("samp_key")).as("neg_key"), id, col("score")), k).as("top"))
      .select(explode(col("top")).as("r"))
      .select(col(s"r.$idCol"), col("r.score"),
        (-col("r.neg_key")).as("samp_key"))
  }

  /** DoReMi-style mixture reweighting (Xie et al. 2023, "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    * domains whose loss EXCEEDS a reference get their mixture weight
    * amplified by multiplicative-weights rounds — the "train more where
    * the reference model struggles" prior, here with FIXED per-domain
    * scores (the standard fixed-reference simplification: the real
    * recipe retrains a proxy between rounds; with fixed scores the
    * rounds amplify one measured signal).
    *
    * INTEGER-EXACT: excess in milli-units (clamped to `[0, capMilli]`,
    * computed only when loss > ref so integer division never sees a
    * negative — floor-vs-truncate semantics diverge there across
    * engines; a non-positive reference is DEFINED as the cap, so the
    * division never sees a zero divisor either), weights in micro-units
    * through `rounds` rounds of
    * `w ← w·(10⁶ + η·excess) div 10⁶`, and the final share is
    * `w·10⁶ div Σw`. Every value replays bit-exactly in plain SQL.
    *
    * Scale shape: per-domain rows only — the update chain is row-local
    * (excess is fixed per domain), the one aggregation is the Σw
    * normalization over ≤|domains| rows, broadcast back. Returns
    * (domain, loss_micro, excess_milli, weight_micro, share_micro).
    */
  def mixtureReweight(
      domainScores: DataFrame, domainCol: String,
      lossMicroCol: String, refMicroCol: String,
      rounds: Int = 5, etaMilli: Int = 100, capMilli: Int = 1000): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds must be in [1, 16], got $rounds")
    require(etaMilli >= 1 && etaMilli <= 1000, s"etaMilli must be in [1, 1000], got $etaMilli")
    require(capMilli >= 1, s"capMilli must be >= 1, got $capMilli")
    val scored = domainScores.select(
      col(domainCol).as("domain"),
      col(lossMicroCol).cast("long").as("loss_micro"),
      col(refMicroCol).cast("long").as("ref_micro"))
      // ref_micro <= 0 is a degenerate reference (any positive loss is
      // infinite excess): defined as the cap EXPLICITLY, so the integer
      // division below never sees a zero/negative divisor — under ANSI
      // mode that would error the whole query, and with ANSI off it
      // would lean on least() skipping NULL to land on the cap by luck
      .withColumn("excess_milli",
        when(col("ref_micro") <= 0L, lit(capMilli.toLong))
          .when(col("loss_micro") <= col("ref_micro"), lit(0L))
          .otherwise(least(lit(capMilli.toLong),
            expr("(loss_micro - ref_micro) * 1000 DIV ref_micro"))))
    val wExpr = (1 to rounds).foldLeft("CAST(1000000 AS BIGINT)") { (prev, _) =>
      s"(($prev) * (1000000 + $etaMilli * excess_milli)) DIV 1000000"
    }
    val weighted = scored.withColumn("weight_micro", expr(wExpr))
    val total = weighted.agg(sum(col("weight_micro")).as("__total"))
    weighted.crossJoin(broadcast(total))
      .select(col("domain"), col("loss_micro"), col("excess_milli"),
        col("weight_micro"),
        expr("weight_micro * 1000000 DIV __total").as("share_micro"))
  }

  /** SSL-prototypes density pruning (Sorscher et al. 2022, "Beyond
    * neural scaling laws"): k-means-cluster the embedding space and keep
    * each cluster's HARDEST `keepMilli`‰ — the examples farthest from
    * their prototype (centroid). Easy, prototypical examples carry the
    * least training signal at scale; pruning them per cluster (not
    * globally) preserves coverage of every mode. The dual of
    * [[Dedup.semantic]] over the same deterministic clustering chain
    * (`SimilaritySearch.trainCentroids` — bit-replayable k-means).
    *
    * Determinism: d2 to the centroid is the exact assignment fold, rank
    * is (d2 desc, id asc), keep count per cluster is integer
    * `max(1, n·keepMilli div 1000)` — the whole chain replays in SQL.
    *
    * Scale: assignment broadcasts centroids (the corpus never shuffles
    * for it); ranking shuffles once on `cell` and sorts within cluster
    * — cells stay bounded by growing nCells with the corpus, the
    * SemDeDup sizing argument.
    */
  def prototypesPrune(
      df: DataFrame, vecCol: String, idCol: String,
      keepMilli: Int, nCells: Int = 64, iterations: Int = 2,
      maxTrainPerCell: Int = 16384): DataFrame = {
    require(keepMilli >= 0 && keepMilli <= 1000,
      s"keepMilli out of range: $keepMilli")
    val cents = SimilaritySearch.trainCentroids(
      df, vecCol, idCol, nCells, iterations, maxTrainPerCell)
    val prepped = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("e"))
      .withColumn("nrm", graft.functions.VectorExpressions.l2Norm(col("e")))
    val assigned = SimilaritySearch.assignCells(prepped, cents)
    val withD2 = assigned.join(broadcast(cents), Seq("cell"))
      .withColumn("d2", aggregate(zip_with(col("e"), col("ce"),
        (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("d2").desc, col("id"))
    withD2
      .withColumn("rnk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("cell"))))
      .where(col("rnk") <= expr(s"greatest(1, (n * $keepMilli) DIV 1000)"))
      .select(col("id"), col("cell"), col("rnk").cast("int").as("rnk"),
        round(col("d2"), 6).as("d2"))
  }
}
