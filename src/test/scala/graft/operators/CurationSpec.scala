package graft.operators

import graft.SparkSpec
import graft.functions.{Sketches, TextFunctions}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // --- repetition signals --------------------------------------------------

  test("repetitionSignals computes word repetition and gram coverage") {
    val docs = Seq(
      (1L, "a a a a"),                                    // pure repetition
      (2L, "one two three four five six"),                // no repetition
      (3L, "x"),                                          // shorter than any gram
      (4L, "go go go go go go")                           // 5-gram duplication
    ).toDF("doc_id", "text")
    val out = Curation.repetitionSignals(docs, "text", "doc_id")
      .orderBy("doc_id").collect()

    val d1 = out(0)
    assert(d1.getAs[Long]("n_words") == 4)
    assert(d1.getAs[Double]("word_rep") == 0.75) // 1 distinct of 4
    // "a a" occurs 3 times, len 3, doc chars 7 → 9/7
    assert(math.abs(d1.getAs[Double]("top2_frac") - 9.0 / 7) < 1e-3)

    val d2 = out(1)
    assert(d2.getAs[Double]("word_rep") == 0.0)
    assert(d2.getAs[Double]("dup5_frac") == 0.0) // both 5-grams unique

    val d3 = out(2)
    assert(d3.getAs[Long]("n_words") == 1)
    assert(d3.getAs[Double]("top2_frac") == 0.0) // no grams at all
    assert(d3.getAs[Double]("dup5_frac") == 0.0)

    // "go go go go go" (len 14) occurs twice among the two 5-grams of doc 4
    val d4 = out(3)
    assert(d4.getAs[Double]("dup5_frac") == math.rint(2 * 14.0 / 17 * 1e4) / 1e4)
  }

  // --- PII scrubbing -------------------------------------------------------

  test("scrubPii redacts and counts emails, IPs and phone numbers") {
    val df = Seq(
      (1L, "mail john.doe+x@ex-a.co or admin@example.org, host 192.168.0.1, call 555-123-4567"),
      (2L, "no pii here at all"),
      (3L, "v1.2.3.4 is a version (no boundary), 1.2.3.4 an ip, 12-34-5678 not a phone")
    ).toDF("id", "text")
    val out = Curation.scrubPii(df, "text").orderBy("id").collect()

    assert(out(0).getAs[Long]("n_emails") == 2)
    assert(out(0).getAs[Long]("n_ips") == 1)
    assert(out(0).getAs[Long]("n_phones") == 1)
    assert(out(0).getAs[String]("text") ==
      "mail <EMAIL> or <EMAIL>, host <IP>, call <PHONE>")

    assert(out(1).getAs[Long]("n_emails") + out(1).getAs[Long]("n_ips") +
      out(1).getAs[Long]("n_phones") == 0)
    assert(out(1).getAs[String]("text") == "no pii here at all")

    // the version-like "v1.2.3.4" has no word boundary before its first
    // octet, so only the bare dotted quad matches; malformed phone doesn't
    assert(out(2).getAs[Long]("n_ips") == 1)
    assert(out(2).getAs[Long]("n_phones") == 0)
    assert(out(2).getAs[String]("text") ==
      "v1.2.3.4 is a version (no boundary), <IP> an ip, 12-34-5678 not a phone")
  }

  test("redaction order prevents email hosts leaking as IPs") {
    val df = Seq((1L, "u@1.2.3.4x.com then 5.6.7.8")).toDF("id", "text")
    val out = Curation.scrubPii(df, "text").collect()(0)
    assert(out.getAs[String]("text") == "u@1.2.3.4x.com then <IP>" ||
      out.getAs[String]("text") == "<EMAIL> then <IP>")
    assert(out.getAs[Long]("n_ips") == 1) // never the email's host digits
  }

  // --- sequence packing ----------------------------------------------------

  test("packSequences lays out a contiguous token stream per shard") {
    val docs = (0L until 40L).map(i => (i, ("w " * ((i % 7).toInt + 1)).trim)).toDF("doc_id", "text")
    val out = Curation.packSequences(docs, "doc_id",
      TextFunctions.tokenCount(col("text")), capacity = 10, shards = 4)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("n_tok"), r.getAs[Long]("tok_offset"),
        r.getAs[Long]("begin_seq"), r.getAs[Long]("end_seq")))

    assert(out.length == 40)
    out.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      // offsets are the exact running sum in id order — no gaps, no overlap
      var expect = 0L
      sorted.foreach { case (_, _, n, off, b, e) =>
        assert(off == expect)
        expect += n
        assert(b == off / 10)
        assert(e == (off + n - 1) / 10)
        assert(e >= b)
      }
    }
    // a doc longer than the capacity spans multiple sequences
    val long = Seq((0L, ("t " * 25).trim)).toDF("doc_id", "text")
    val row = Curation.packSequences(long, "doc_id",
      TextFunctions.tokenCount(col("text")), capacity = 10, shards = 1).collect()(0)
    assert(row.getAs[Long]("begin_seq") == 0 && row.getAs[Long]("end_seq") == 2)
  }

  // --- stratified sampling -------------------------------------------------

  test("sampleByGroup keeps exactly k per group, deterministically") {
    val rows = (0L until 300L).map(i => (s"g${i % 3}", i)).toDF("grp", "id")
    val s1 = Curation.sampleByGroup(rows, "grp", "id", 7)
      .as[(String, Long)].collect().sorted.toSeq
    val s2 = Curation.sampleByGroup(rows, "grp", "id", 7)
      .as[(String, Long)].collect().sorted.toSeq
    assert(s1 == s2)                                   // deterministic
    assert(s1.groupBy(_._1).forall(_._2.size == 7))    // exactly k per group
    assert(s1.forall { case (g, i) => s"g${i % 3}" == g }) // members stay in-group

    // groups smaller than k are kept whole
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("grp", "id")
    assert(Curation.sampleByGroup(tiny, "grp", "id", 10).count() == 3)
  }

  // --- composite filter ----------------------------------------------------

  test("gopherFilter names every failed rule") {
    val docs = Seq(
      (1L, Seq.fill(60)("word").zipWithIndex.map { case (w, i) => s"$w$i" }.mkString(" ")),
      (2L, "tiny doc"),                              // too_short
      (3L, ("go " * 60).trim),                       // too_repetitive (and short words)
      (4L, Seq.fill(60)("!!!###!!!").mkString(" "))  // too_much_punct
    ).toDF("doc_id", "text")
    val out = Curation.gopherFilter(docs, "text", "doc_id", minWords = 50)
      .select("doc_id", "passed", "reasons").orderBy("doc_id").collect()

    assert(out(0).getAs[Boolean]("passed") && out(0).getAs[String]("reasons") == "")
    assert(!out(1).getAs[Boolean]("passed"))
    assert(out(1).getAs[String]("reasons").contains("too_short"))
    val r3 = out(2).getAs[String]("reasons")
    assert(r3.contains("too_repetitive") && r3.contains("words_too_short"))
    assert(out(3).getAs[String]("reasons").contains("too_much_punct"))
  }

  // --- mixture sampling ----------------------------------------------------

  test("tokenBudget keeps a deterministic hash-order prefix within the budget") {
    import org.apache.spark.sql.functions._
    val docs = (1L to 200L).map(i => (i, "w " * ((i % 10).toInt + 1))).toDF("doc_id", "text")
    val tok = size(split(col("text"), " "))
    val got = Curation.tokenBudget(docs, "doc_id", tok, budget = 300L, buckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.map(_._2).sum <= 300L)
    // replay: hash order + inclusive running sum, independent formulation
    val hk = docs.select(col("doc_id"), tok.cast("long").as("t"),
      graft.functions.Sketches.splitmixLong(col("doc_id")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1))
    var cum = 0L
    val expected = hk.flatMap { case (id, t, _) =>
      cum += t; if (cum <= 300L) Some((id, t, cum)) else None
    }
    assert(got.sortBy(_._3).toSeq == expected.toSeq)
    // budget covering everything keeps everything; zero keeps nothing
    assert(Curation.tokenBudget(docs, "doc_id", tok, budget = 10000000L,
      buckets = 16).count() == 200L)
    assert(Curation.tokenBudget(docs, "doc_id", tok, budget = 0L,
      buckets = 16).count() == 0L)
  }

  test("sampleMixture thins deterministically at the requested rate") {
    val rows = (0L until 4000L).map(i => (i, s"s${i % 2}")).toDF("id", "src")
    val all = Curation.sampleMixture(rows, "id", lit(1.0))
    assert(all.count() == 4000) // rate 1 keeps everything
    assert(Curation.sampleMixture(rows, "id", lit(0.0)).count() == 0)

    val half = Curation.sampleMixture(rows, "id", lit(0.5))
    val n = half.count()
    assert(n > 1800 && n < 2200, s"rate 0.5 kept $n of 4000")
    // deterministic: same keep set on re-run
    assert(half.select("id").as[Long].collect().sorted.toSeq ==
      Curation.sampleMixture(rows, "id", lit(0.5)).select("id").as[Long].collect().sorted.toSeq)
    // monotone: a kept id at rate r stays kept at any higher rate
    val kept25 = Curation.sampleMixture(rows, "id", lit(0.25))
      .select("id").as[Long].collect().toSet
    val kept50 = half.select("id").as[Long].collect().toSet
    assert(kept25.subsetOf(kept50))
  }

  test("assignSplits: exhaustive, proportional, growth-stable, replayable") {
    val rows = (0L until 4000L).map(i => (i, s"s${i % 2}")).toDF("id", "src")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Curation.assignSplits(rows, "id", splits, seed = 7L)
      .select("id", "split").as[(Long, String)].collect().toMap
    // every row assigned exactly once (withColumn preserves row count)
    assert(got.size == 4000)
    val byName = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byName("train") > 3000 && byName("train") < 3400, byName.toString)
    assert(byName("val") > 250 && byName("val") < 550, byName.toString)
    assert(byName("test") > 250 && byName("test") < 550, byName.toString)
    // independent plain-Scala replay of the threshold chain
    val t1 = math.floor(0.8 * 9007199254740992.0).toLong
    val t2 = math.floor(0.9 * 9007199254740992.0).toLong
    (0L until 4000L).foreach { id =>
      val u = Sketches.splitmix64(id ^ 7L) >>> 11
      val want = if (u < t1) "train" else if (u < t2) "val" else "test"
      assert(got(id) == want, s"id=$id")
    }
    // growth stability: assignment over a subset equals the full corpus's
    val sub = Curation.assignSplits(rows.filter($"id" < 1000), "id", splits, seed = 7L)
      .select("id", "split").as[(Long, String)].collect().toMap
    sub.foreach { case (id, sp) => assert(got(id) == sp) }
    // invalid fraction sets fail fast
    intercept[IllegalArgumentException] {
      Curation.assignSplits(rows, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Curation.assignSplits(rows, "id", Seq("a" -> 0.5, "a" -> 0.5))
    }
    // single split degenerates to a constant label
    assert(Curation.assignSplits(rows, "id", Seq("all" -> 1.0))
      .select("split").distinct().as[String].collect().toSeq == Seq("all"))
    // GROUP-keyed splits (string key): constant within a group — the
    // leakage-safe eval-split property
    val bySrc = Curation.assignSplits(rows, "src", splits, seed = 7L)
      .select("src", "split").distinct().collect()
    assert(bySrc.length == 2, bySrc.mkString(","))
  }

  test("knSurprisal matches a plain-Scala Kneser-Ney replay") {
    val docs = Seq(
      (1L, "new york new york city"),
      (2L, "new jersey and new york"),
      (3L, "the city and the york")  // 'york' here follows 'the', not 'new'
    ).toDF("doc_id", "text")
    val got = Curation.knSurprisal(docs, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq

    // scalar replay with the exact integer rational + quantization
    val corpus = Seq("new york new york city", "new jersey and new york",
      "the city and the york").map(_.split("\\s+").toSeq)
    val pairs = corpus.flatMap(t => t.sliding(2).map(p => (p(0), p(1))).toSeq)
    val bc = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cv = bc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1v = bc.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1w = bc.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val tt = bc.size.toLong
    def micro(v: String, w: String): Long = {
      val num = (math.max(4L * bc((v, w)) - 3L, 0L) * tt + 3L * n1v(v) * n1w(w)).toDouble
      val den = (4L * cv(v) * tt).toDouble
      math.floor(1e6 * -math.log(num / den) + 0.5).toLong
    }
    val want = corpus.zipWithIndex.map { case (t, i) =>
      val ms = t.sliding(2).map(p => micro(p(0), p(1))).toSeq
      (i + 1L, ms.size.toLong, ms.sum / ms.size)
    }
    assert(got == want, s"got=$got want=$want")

    // KN semantics: 'york' has only predecessor diversity 2 — its
    // continuation probability is low despite high raw frequency, so an
    // unseen-context use would be penalized; here check the continuation
    // term orders types sensibly: p(york|the) exists and got scored
    assert(bc.contains(("the", "york")))
  }

  test("hard negatives carry only cross-label neighbors, ranked by similarity") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.99f, 0.14f), 0),
      (3L, Array(0.98f, 0.2f), 1), (4L, Array(0.0f, 1.0f), 1),
      (5L, Array(0.7f, 0.7f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = SimilaritySearch.hardNegatives(
      vecs, vecs.filter(col("vec_id") === 1), "embedding", "vec_id", "label", k = 2)
      .orderBy("rnk").collect()
    // query 1 (label 0): nearest cross-label are 3 (label 1) then 5 (label 2);
    // 2 shares the label and must NOT appear
    assert(out.map(_.getAs[Long]("nid")).toSeq == Seq(3L, 5L))
  }

  // --- SemDeDup ------------------------------------------------------------

  test("semantic dedup pairs only within a cluster, above the threshold") {
    // two well-separated clusters in 2-D, plus one outlier
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.99f, 0.01f)), (3L, Array(0.98f, -0.01f)),
      (4L, Array(0.0f, 1.0f)), (5L, Array(0.01f, 0.99f)),
      (6L, Array(-1.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.semantic(vecs, "embedding", "vec_id",
      minCosine = 0.95, nCells = 2, maxTrainPerCell = 16)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("cosine")))

    // every reported pair is genuinely above threshold and ordered
    pairs.foreach { case (a, b, c) => assert(a < b && c >= 0.95) }
    // the tight x-cluster pairs are found
    val found = pairs.map(p => (p._1, p._2)).toSet
    assert(found.contains((1L, 2L)) && found.contains((1L, 3L)) && found.contains((2L, 3L)))
    // nothing pairs across the two orthogonal clusters
    assert(!found.exists { case (a, b) => a <= 3 && b >= 4 && b <= 5 })
  }

  test("semantic dedup + dropNearDuplicates keeps cluster representatives") {
    val vecs = Seq(
      (10L, Array(1.0f, 0.0f)), (11L, Array(0.999f, 0.001f)),
      (20L, Array(0.0f, 1.0f)), (21L, Array(0.001f, 0.999f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.semantic(vecs, "embedding", "vec_id",
      minCosine = 0.99, nCells = 2, maxTrainPerCell = 16)
    val kept = Dedup.dropNearDuplicates(vecs, pairs, "vec_id")
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(10L, 20L))
  }

  test("tokenBudgetByGroup keeps an independent hash-order prefix per group") {
    import org.apache.spark.sql.functions._
    val docs = (1L to 120L).map(i => (s"g${i % 3}", i, "w " * ((i % 10).toInt + 1)))
      .toDF("grp", "doc_id", "text")
    val tok = size(split(col("text"), " "))
    val budget = when(col("grp") === "g0", 0L)
      .when(col("grp") === "g1", 60L).otherwise(100000L)
    val got = Curation.tokenBudgetByGroup(docs, "grp", "doc_id", tok, budget, buckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // zero-budget group drops everything; unbounded group keeps everything
    assert(!got.exists(_._1 == "g0"))
    assert(got.count(_._1 == "g2") == 40)
    // bounded group: exact per-group hash-order prefix, independently replayed
    val g1 = docs.filter(col("grp") === "g1")
      .select(col("doc_id"), tok.cast("long").as("t"),
        graft.functions.Sketches.splitmixLong(col("doc_id")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1))
    var cum = 0L
    val expect = g1.flatMap { case (id, t, _) =>
      cum += t; if (cum <= 60L) Some((id, t, cum)) else None
    }.toSeq
    assert(got.filter(_._1 == "g1").sortBy(_._4).map(t => (t._2, t._3, t._4)).toSeq == expect)
  }

  test("shuffleShards emits a reproducible seeded permutation") {
    import org.apache.spark.sql.functions._
    val ids = (1L to 500L).toSeq
    val docs = ids.map(Tuple1(_)).toDF("doc_id")
    val got = Curation.shuffleShards(docs, "doc_id", shards = 8, seed = 17L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))

    // a permutation: every id exactly once, global positions dense 0..N-1,
    // per-shard positions dense from 0
    assert(got.map(_._1).sorted.toSeq == ids)
    assert(got.map(_._4).sorted.toSeq == (0L until 500L).toSeq)
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // independent replay: shard = top hash bits keeps shard-major order
    // equal to plain splitmix64(id ^ seed) ascending (id-asc tiebreak)
    val expect = ids.map(i => (i, graft.functions.Sketches.splitmix64(i ^ 17L)))
      .sortBy { case (id, h) => (h, id) }.map(_._1)
    assert(got.sortBy(_._4).map(_._1).toSeq == expect)
    // a different seed is a different permutation
    val got0 = Curation.shuffleShards(docs, "doc_id", shards = 8, seed = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(got0.sortBy(_._2).map(_._1).toSeq != expect)
  }

  /** Independent bigram-surprisal reference: plain Scala collections,
    * same float op order and quantization as the operator.
    */
  private def bigramReference(
      texts: Map[Long, String], lambda: Double): Seq[(Long, Long, Long)] = {
    val toks = texts.view.mapValues(_.trim.split("\\s+").toSeq).toMap
    val uni = toks.values.flatten.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = uni.values.sum.toDouble
    val pairs = toks.view.mapValues(w => w.zip(w.drop(1))).toMap
    val bc = pairs.values.flatten.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def micro(p: (String, String)): Long =
      math.floor(1e6 * -math.log(
        lambda * (bc(p).toDouble / uni(p._1).toDouble) +
          (1.0 - lambda) * (uni(p._2).toDouble / tot)) + 0.5).toLong
    pairs.toSeq.filter(_._2.nonEmpty).map { case (id, ps) =>
      val s = ps.map(micro).sum
      (id, ps.size.toLong, s / ps.size)
    }.sortBy(_._1)
  }

  test("bigramSurprisal matches a plain-Scala reference in micro-nats") {
    val texts = Map(
      1L -> "the cat sat on the mat",
      2L -> "the cat sat",
      3L -> "mat the",
      4L -> "solo",                  // < 2 words → absent from the output
      5L -> "zz qq zz qq zz")
    val docs = texts.toSeq.map { case (id, t) => (id, t) }.toDF("doc_id", "text")
    val got = Curation.bigramSurprisal(docs, "text", "doc_id", lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == bigramReference(texts, 0.7))
    assert(!got.exists(_._1 == 4L))
  }

  test("bigramSurprisal matches the reference on randomized corpora") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 30).map(i => s"w$i")
    val texts = (1L to 60L).map { id =>
      val n = rnd.nextInt(12) // includes 0- and 1-word docs
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }.toMap
    val docs = texts.toSeq.map { case (id, t) => (id, t) }.toDF("doc_id", "text")
    val got = Curation.bigramSurprisal(docs, "text", "doc_id", lambda = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // the reference counts unigrams over ALL docs (like the operator) and
    // naturally drops pair-less docs from the output
    assert(got.toSeq == bigramReference(texts, 0.5))
  }

  test("chunkDocuments covers every token with overlapping windows") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 words
      (2L, "a b c"),                                  // shorter than one chunk
      (3L, "")                                        // empty → absent
    ).toDF("doc_id", "text")
    val got = Curation.chunkDocuments(docs, "text", "doc_id", chunk = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4))).sortBy(t => (t._1, t._2))

    // doc 1: starts 0,3,6,9 → windows of 4,4,4,1 tokens
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0, 0L, 4L), (1, 3L, 4L), (2, 6L, 4L), (3, 9L, 1L)))
    assert(d1.head._5 == "w1 w2 w3 w4" && d1.last._5 == "w10")
    // every token position is covered by at least one window
    val covered = d1.flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered == (0L until 10L).toSet)
    // doc 2: one short window; doc 3 absent
    assert(got.filter(_._1 == 2L).map(c => (c._2, c._3, c._4, c._5)).toSeq ==
      Seq((0, 0L, 3L, "a b c")))
    assert(!got.exists(_._1 == 3L))
  }

  test("topVocabulary ranks by count desc with term-asc ties") {
    val docs = Seq((1L, "b b b a a c"), (2L, "a c d")).toDF("doc_id", "text")
    val got = Curation.topVocabulary(docs, "text", k = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // counts: a=3, b=3, c=2, d=1 → tie a/b broken term-asc
    assert(got == Seq((1, "a", 3L), (2, "b", 3L), (3, "c", 2L)))
  }

  test("canonicalUrl collapses case, ports, tracking params and fragments") {
    import graft.functions.TextFunctions.canonicalUrl
    val urls = Seq(
      "HTTP://WWW.Ex.COM:80/a/b/?b=2&utm_source=f&a=1#frag",
      "http://ex.com/a/b?a=1&b=2",
      "https://ex.com:443/a",
      "https://ex.com:8443/a",          // non-default port survives
      "http://ex.com",                  // no path, no query
      "http://ex.com/?fbclid=XYZ&gclid=1&z=9")
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val got = urls.select(col("id"), canonicalUrl(col("url")).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(0L) == "http://ex.com/a/b?a=1&b=2")
    assert(got(1L) == got(0L))          // messy and clean collapse
    assert(got(2L) == "https://ex.com/a")
    assert(got(3L) == "https://ex.com:8443/a")
    assert(got(4L) == "http://ex.com")
    assert(got(5L) == "http://ex.com?z=9")
  }

  // --- DSIR importance resampling ------------------------------------------

  /** Independent reference: same math, plain Scala collections. */
  private def dsirReference(
      raw: Seq[(Long, String)], target: Seq[String],
      k: Int, buckets: Int, seed: Long): Seq[(Long, Long, Long)] = {
    import graft.functions.Sketches
    def feats(t: String): Seq[String] = {
      val w = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      w ++ w.iterator.sliding(2).withPartial(false).map(_.mkString(" "))
    }
    def bucketOf(f: String): Int =
      java.lang.Math.floorMod(Sketches.hashString(f, seed), buckets.toLong).toInt
    val tCnt = target.flatMap(feats).groupBy(bucketOf).view.mapValues(_.size.toLong).toMap
    val rCnt = raw.flatMap(d => feats(d._2)).groupBy(bucketOf).view.mapValues(_.size.toLong).toMap
    val tt = tCnt.values.sum.toDouble
    val tr = rCnt.values.sum.toDouble
    def lam(b: Int): Long =
      math.floor(1e6 * (math.log((tCnt.getOrElse(b, 0L) + 1.0) / (tt + buckets)) -
        math.log((rCnt.getOrElse(b, 0L) + 1.0) / (tr + buckets))) + 0.5).toLong
    val keyed = raw.map { case (id, text) =>
      val score = feats(text).map(f => lam(bucketOf(f))).sum
      val u = ((Sketches.splitmix64(id ^ seed) >>> 11).toDouble + 0.5) * math.pow(2.0, -53)
      (id, score, score + math.floor(1e6 * -math.log(-math.log(u)) + 0.5).toLong)
    }
    keyed.sortBy { case (id, _, key) => (-key, id) }.take(k).sortBy(_._1)
  }

  test("importanceResample matches an independent reference exactly") {
    val raw = (0L until 60L).map { i =>
      val dom = if (i % 3 == 0) "alpha beta gamma delta" else "red green blue cyan"
      (i, s"$dom doc$i word${i % 7} word${i % 11} tail")
    }
    val target = Seq(
      "alpha beta gamma targets", "beta gamma delta alpha", "gamma alpha beta")
    val out = Curation.importanceResample(
        raw.toDF("doc_id", "text"),
        target.map(Tuple1(_)).toDF("text"),
        "text", "doc_id", k = 12, buckets = 256, seed = 0x7a5a0d51e5a3b1c9L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ref = dsirReference(raw, target, k = 12, buckets = 256, seed = 0x7a5a0d51e5a3b1c9L)
    assert(out == ref)
    // the selection must lean toward the alpha/beta/gamma target domain
    val targetShare = out.count(_._1 % 3 == 0).toDouble / out.size
    assert(targetShare >= 0.75, s"expected target-domain docs to dominate, got $targetShare")
  }

  test("importanceResample handles empty docs and k > corpus") {
    val raw = Seq((1L, "alpha beta"), (2L, ""), (3L, "   "), (4L, "solo")).toDF("doc_id", "text")
    val target = Seq(Tuple1("alpha beta alpha")).toDF("text")
    val out = Curation.importanceResample(raw, target, "text", "doc_id", k = 10,
      buckets = 64)
    assert(out.count() == 4) // k > corpus → everything selected
    // empty/whitespace docs featurize to nothing → integer score 0
    val scores = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(2L) == 0L && scores(3L) == 0L)
  }

  test("interleaveMixture: analytic positions equal an independent rational sort") {
    val rnd = new scala.util.Random(7L)
    val rows = (0 until 60).map(i => (i.toLong, s"src${rnd.nextInt(3)}")) ++
      Seq((1000L, "ghost")) // unlisted source → excluded
    val df = rows.toDF("id", "source")
    val weights = Seq(("src0", 3L), ("src1", 2L), ("src2", 1L))
    val out = Curation.interleaveMixture(df, "source", "id", weights,
      shards = 4, seed = 5L).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("id"),
        r.getAs[Long]("source_pos"), r.getAs[Long]("global_pos"),
        r.getAs[Int]("shard"), r.getAs[Long]("pos")))
    val n = rows.count(_._2 != "ghost")
    assert(out.length == n && !out.exists(_._1 == "ghost"))
    // global_pos is a permutation
    assert(out.map(_._4).sorted.toSeq == (0L until n.toLong))
    // source_pos follows the seeded splitmix hash order within each source
    out.groupBy(_._1).foreach { case (_, g) =>
      val byPos = g.sortBy(_._3)
      assert(byPos.map(_._3).toSeq == (0L until g.length.toLong))
      val hashOrdered = g.sortBy(t =>
        (graft.functions.Sketches.splitmix64(t._2 ^ 5L), t._2))
      assert(byPos.map(_._2).toSeq == hashOrdered.map(_._2).toSeq)
    }
    // independent formulation: sort by the rational stride key with exact
    // cross-multiplied comparisons, ties by weights position
    val wIdx = weights.map(_._1).zipWithIndex.toMap
    val wOf = weights.toMap
    val sorted = out.sortWith { case ((s1, _, j1, _, _, _), (s2, _, j2, _, _, _)) =>
      val l = (2 * j1 + 1) * wOf(s2); val r = (2 * j2 + 1) * wOf(s1)
      if (l != r) l < r else wIdx(s1) < wIdx(s2)
    }
    assert(sorted.map(_._4).toSeq == (0L until n.toLong),
      "analytic global_pos must equal the sort-based rank")
    // shards are contiguous global ranges with within-shard positions
    out.foreach { case (_, _, _, g, s, p) =>
      assert(s == (g * 4 / n).toInt)
      assert(p == g - (s.toLong * n + 3) / 4)
    }
  }

  test("interleaveMixture merges without a global sort or corpus join") {
    val df = (0 until 100).map(i => (i.toLong, s"s${i % 2}")).toDF("id", "source")
    val plan = Curation.interleaveMixture(df, "source", "id",
      Seq(("s0", 2L), ("s1", 1L)), shards = 4)
      .queryExecution.executedPlan.toString
    // the global order is computed analytically: no range exchange (a
    // global sort would need one) and no corpus-vs-corpus join (counts
    // arrive as one broadcast map row)
    assert(!plan.contains("Exchange rangepartitioning"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("interleaveMixture: equal weights alternate in source order") {
    val df = ((0 until 4).map(i => (i.toLong, "a")) ++
      (10 until 14).map(i => (i.toLong, "b"))).toDF("id", "source")
    val out = Curation.interleaveMixture(df, "source", "id",
      Seq(("a", 1L), ("b", 1L)), shards = 1)
      .orderBy("global_pos").collect().map(_.getAs[String]("source")).toSeq
    assert(out == Seq("a", "b", "a", "b", "a", "b", "a", "b"))
  }

  test("interleaveMixture: prefix proportions track the weights") {
    val df = (0 until 300).map(i =>
      (i.toLong, if (i % 3 == 0) "heavy" else "light")).toDF("id", "source")
    // heavy has 100 rows at weight 4, light 200 rows at weight 1: until
    // heavy exhausts, every aligned window of 5 holds 4 heavy + 1 light
    val out = Curation.interleaveMixture(df, "source", "id",
      Seq(("heavy", 4L), ("light", 1L)), shards = 2)
      .orderBy("global_pos").collect().map(_.getAs[String]("source"))
    val prefix = out.take(100)
    val heavyIn = prefix.count(_ == "heavy")
    assert(heavyIn >= 75 && heavyIn <= 85,
      s"first 100 slots should carry ~80 heavy rows, got $heavyIn")
    // stride guarantee, not just ratio: heavy never starves for > 2 slots
    val gaps = out.zipWithIndex.filter(_._1 == "heavy").map(_._2)
    assert(gaps.sliding(2).forall { case Array(x, y) => y - x <= 2; case _ => true })
  }

  test("importanceResample scores against a broadcast, with no windows") {
    val raw = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val target = Seq(Tuple1("a b")).toDF("text")
    val plan = Curation.importanceResample(raw, target, "text", "doc_id", k = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "scoring must not use windows")
    // the corpus is scored row-locally against the one-row broadcast
    // weight array (the only joins touching the corpus are broadcasts;
    // the bucket-histogram full-outer join is ≤`buckets` rows and may
    // sort-merge — that's bounded state, not a scale concern)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "weight array must reach the corpus as a broadcast")
    // the histogram frame is persisted: its corpus pass runs ONCE, not
    // once per consumer (totals ×2 + weight rows)
    assert(plan.contains("InMemoryTableScan"),
      "bucket histogram must be cached across its three consumers")
  }

  test("temperatureSample: alpha=1 keeps natural proportions, low alpha boosts the tail") {
    val rnd = new scala.util.Random(7L)
    // skewed classes: 800 'en', 150 'de', 50 'fr'
    val rows = Seq.tabulate(1000) { i =>
      val c = if (i < 800) "en" else if (i < 950) "de" else "fr"
      (i.toLong, c)
    }
    val df = rows.toDF("id", "cls")
    // alpha = 1: every class keeps the same rate (= targetFraction)
    val flat = Curation.temperatureSample(df, "cls", "id", alpha = 1.0,
      targetFraction = 0.5)
    val flatRates = flat.select("cls", "keep_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    flatRates.values.foreach(r => assert(math.abs(r - 0.5) < 1e-6, flatRates))

    // alpha = 0.3: the tail class's keep rate must exceed the head's
    val skew = Curation.temperatureSample(df, "cls", "id", alpha = 0.3,
      targetFraction = 0.5)
    val rates = skew.select("cls", "keep_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("fr") > rates("de") && rates("de") > rates("en"), rates)

    // deterministic: the exact same keep set on re-evaluation
    val a = skew.select("id").as[Long].collect().toSet
    val b = Curation.temperatureSample(df, "cls", "id", alpha = 0.3,
      targetFraction = 0.5).select("id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)

    // empirical share shift: sampled 'fr' share must beat its natural share
    val kept = skew.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val frShare = kept.getOrElse("fr", 0L).toDouble / kept.values.sum
    assert(frShare > 0.05, s"tail share not boosted: $kept")
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val v1 = Seq((1L, "same text"), (2L, "will change"), (3L, "goes away"),
      (4L, "Same   Text normalized")).toDF("doc_id", "text")
    val v2 = Seq((1L, "same text"), (2L, "has changed"), (5L, "brand new"),
      (4L, "same text NORMALIZED")).toDF("doc_id", "text")
    val got = Curation.snapshotDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // id 4 differs only in whitespace/case → unchanged under the
    // normalized fingerprint → absent from the diff
    assert(got == Map(2L -> "changed", 3L -> "removed", 5L -> "added"), got)
  }

  test("temperatureSample: string ids hash deterministically; unsupported id types fail fast") {
    val df = Seq.tabulate(300)(i => (s"doc-$i", if (i % 4 == 0) "tail" else "head"))
      .toDF("id", "cls")
    val a = Curation.temperatureSample(df, "cls", "id", 0.5, 0.5)
      .select("id").as[String].collect().toSet
    val b = Curation.temperatureSample(df, "cls", "id", 0.5, 0.5)
      .select("id").as[String].collect().toSet
    assert(a == b && a.nonEmpty && a.size < 300)
    val bad = Seq((1.5, "x")).toDF("id", "cls")
    val err = intercept[IllegalArgumentException] {
      Curation.temperatureSample(bad, "cls", "id", 0.5, 0.5)
    }
    assert(err.getMessage.contains("integral or string"))
  }

  test("temperatureSample plan: corpus filtered row-locally against broadcast rates") {
    val df = Seq.tabulate(100)(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "cls")
    val plan = Curation.temperatureSample(df, "cls", "id", 0.5, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "no window functions")
    assert(!plan.contains("SortMergeJoin"),
      s"rates must broadcast to the corpus:\n$plan")
  }

  test("sampleWeightedByGroup: plain-Scala A-ES replay; weights bias the sample") {
    import org.apache.spark.sql.functions._
    val rows = (0L until 300L).map(i => (s"g${i % 3}", i, if (i % 10 == 0) 50.0 else 1.0))
    val df = rows.toDF("grp", "id", "w")
    val got = Curation.sampleWeightedByGroup(df, "grp", "id", col("w"), k = 8, seed = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq

    // independent replay
    val want = rows.groupBy(_._1).toSeq.flatMap { case (g, members) =>
      members.map { case (_, id, w) =>
        val h = graft.functions.Sketches.splitmix64(id ^ 3L)
        val u = ((h >>> 11).toDouble + 0.5) / 9007199254740992.0
        val key = math.floor(1e6 * (math.log(u) / w) + 0.5).toLong
        (g, id, key)
      }.sortBy(t => (-t._3, t._2)).take(8)
    }.sorted
    assert(got == want)

    // the 50×-weighted members (id % 10 == 0) dominate the kept set
    val heavyKept = got.count(_._2 % 10 == 0)
    assert(heavyKept > got.size / 2, s"weighting too weak: $heavyKept of ${got.size}")

    // non-positive weights fail fast instead of skewing silently
    val bad = Seq(("g", 1L, 0.0)).toDF("grp", "id", "w")
    val e = intercept[Exception] {
      Curation.sampleWeightedByGroup(bad, "grp", "id", col("w"), k = 1).collect()
    }
    assert(e.getMessage.contains("weight must be > 0"))
  }

  test("exportShards: re-read shards verify against the manifest; tampering breaks the signature") {
    import spark.implicits._
    import graft.functions.Sketches
    val docs = (0L until 200L).map(i => (i, s"doc $i body ${"w " * (i % 9).toInt}"))
      .toDF("id", "text")
    val out = java.nio.file.Files.createTempDirectory("export").toString + "/rel"
    val manifest = Curation.exportShards(docs, "id", "text", out, shards = 4, seed = 9L)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(3))).toMap

    // the consumer's verification pass: recompute per-shard signatures
    // from the RE-READ parquet — must equal the manifest exactly
    val back = spark.read.parquet(out)
    assert(back.count() == 200)
    val re = back.select(col("shard"),
        Sketches.stringHash64(
          concat_ws("\u0001", col("id").cast("string"), col("text")), 9L).as("rh"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(rh)").as("sig"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(re == manifest, s"$re vs $manifest")

    // tampering (dropping one row) must break that shard's signature
    val victim = back.limit(1).collect()(0)
    val tampered = back.where(!(col("id") === victim.getAs[Long]("id")))
      .select(col("shard"),
        Sketches.stringHash64(
          concat_ws("\u0001", col("id").cast("string"), col("text")), 9L).as("rh"))
      .groupBy(col("shard"))
      .agg(expr("bit_xor(rh)").as("sig"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val vShard = victim.getAs[Int]("shard")
    assert(tampered(vShard) != manifest(vShard)._2)
  }

  test("cdcChunkDocuments equals an independent mod-32 window replay on random text") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdef 字文."
    def randText(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val docs = (0 until 30).map(i => (i.toLong, randText(rnd.nextInt(120))))
    val got = Curation.cdcChunkDocuments(
      docs.toDF("doc_id", "text"), "text", "doc_id", maskBits = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .sortBy(t => (t._1, t._2)).toSeq

    // independent formulation: the oracle's identity — h_i mod 32 is a
    // 5-term window sum of mod-32 gear values, no sequential fold
    val want = docs.flatMap { case (id, text) =>
      val cps = text.codePoints().toArray
      val n = cps.length
      if (n == 0) Nil
      else {
        val gm = cps.map { cp =>
          val g = graft.functions.Sketches.splitmix64(cp.toLong)
          ((g % 32) + 32) % 32
        }
        val cuts = (1 until n).filter { i => // 1-based position i = index i-1
          val lo = math.max(1, i - 4)
          (lo to i).map(j => gm(j - 1) << (i - j)).sum % 32 == 0
        }
        val starts = 1 +: cuts.map(_ + 1)
        val ends = cuts :+ n
        starts.zip(ends).zipWithIndex.map { case ((st, en), idx) =>
          val txt = new String(cps.slice(st - 1, en).flatMap(Character.toChars))
          (id, idx, st, en - st + 1, txt)
        }
      }
    }.sortBy(t => (t._1, t._2))
    assert(got == want)
  }

  test("cdcChunkDocuments: chunks tile the text; boundaries survive a prefix edit") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog and then the " +
      "quick brown fox jumps again over yet another lazy dog in the yard " +
      "until every word has been chunked into content defined pieces"
    val df = Seq((1L, text), (2L, "INSERTED BYTES " + text), (3L, ""))
      .toDF("doc_id", "text")
    val out = Curation.cdcChunkDocuments(df, "text", "doc_id", maskBits = 4)
      .collect()
    val byDoc = out.groupBy(_.getLong(0))

    // tiling: chunks are contiguous, start at 1, concatenate to the text
    val c1 = byDoc(1L).sortBy(_.getInt(1))
    assert(c1.head.getAs[Int]("start") == 1)
    assert(c1.map(_.getAs[String]("chunk_text")).mkString == text)
    c1.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Int]("start") ==
          a.getAs[Int]("start") + a.getAs[Int]("len"))
      case _ =>
    }
    assert(c1.length >= 3, s"expected several chunks, got ${c1.length}")

    // empty doc → no chunks
    assert(!byDoc.contains(3L))

    // content-defined: a cut decision sees only the trailing maskBits
    // code points, so after a PREFIX insertion every boundary beyond the
    // first affected chunk lands on the same content — the chunk-text
    // suffix is shared (fixed-width chunking would share nothing)
    val t1 = c1.map(_.getAs[String]("chunk_text")).toSeq
    val t2 = byDoc(2L).sortBy(_.getInt(1)).map(_.getAs[String]("chunk_text")).toSeq
    val common = t1.reverse.zip(t2.reverse).takeWhile { case (a, b) => a == b }.length
    assert(common >= t1.length - 2,
      s"suffix stability broke: $common shared of ${t1.length}\n$t1\n$t2")
  }

  test("mixtureReweight matches a plain-Scala multiplicative-weights replay") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // (domain, loss, ref): 'hard' 50% over ref, 'mild' 10% over,
    // 'easy' under (excess 0), 'extreme' 300% over (clamped to cap)
    val scores = Seq(
      ("hard", 1500000L, 1000000L), ("mild", 1100000L, 1000000L),
      ("easy", 800000L, 1000000L), ("extreme", 4000000L, 1000000L))
      .toDF("domain", "loss", "ref")
    val got = Curation.mixtureReweight(scores, "domain", "loss", "ref",
      rounds = 3, etaMilli = 100, capMilli = 1000)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))

    // independent replay
    def replay(excess: Long): Long =
      (1 to 3).foldLeft(1000000L)((w, _) => w * (1000000L + 100L * excess) / 1000000L)
    val ex = Map("hard" -> 500L, "mild" -> 100L, "easy" -> 0L, "extreme" -> 1000L)
    val ws = ex.view.mapValues(replay).toMap
    val total = ws.values.sum
    got.foreach { case (d, e, w, s) =>
      assert(e == ex(d), s"excess for $d")
      assert(w == ws(d), s"weight for $d")
      assert(s == w * 1000000L / total, s"share for $d")
    }
    // shares sum to ~1e6 (floor rounding loses at most |domains|-1)
    val shareSum = got.map(_._4).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - 4)
    // the over-loss domains gained share relative to uniform; easy lost
    assert(got.find(_._1 == "extreme").get._4 > 250000L)
    assert(got.find(_._1 == "easy").get._4 < 250000L)
  }

  test("prototypesPrune keeps each cluster's hardest integer fraction, deterministically") {
    val corpus = ((0 until 40).map(i => (i.toLong, Seq.tabulate(16)(d => math.sin(i * 31 + d).toFloat)))
      ).toDF("vec_id", "embedding")
    def run() = Curation.prototypesPrune(corpus, "embedding", "vec_id",
      keepMilli = 300, nCells = 2, maxTrainPerCell = 64)
      .orderBy("cell", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val a = run().toSeq
    assert(a == run().toSeq, "bit-deterministic across runs")
    // per-cell: ranks contiguous from 1, keep count = max(1, n*300/1000)
    val cents = SimilaritySearch.trainCentroids(corpus, "embedding", "vec_id", 2, 2, 64)
    val sizes = SimilaritySearch.assignCells(
      corpus.select(col("vec_id").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
        .withColumn("nrm", graft.functions.VectorExpressions.l2Norm(col("e"))), cents)
      .groupBy("cell").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.groupBy(_._2).foreach { case (cell, rows) =>
      val expectKeep = math.max(1L, sizes(cell) * 300 / 1000)
      assert(rows.length == expectKeep, s"cell $cell kept ${rows.length} of ${sizes(cell)}")
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length).toSeq)
      // hardest first: d2 non-increasing with rank
      val byRank = rows.sortBy(_._3).map(_._4)
      assert(byRank.zip(byRank.drop(1)).forall { case (x, y) => x >= y })
    }
    intercept[IllegalArgumentException] {
      Curation.prototypesPrune(corpus, "embedding", "vec_id", keepMilli = 1001)
    }
  }
}
