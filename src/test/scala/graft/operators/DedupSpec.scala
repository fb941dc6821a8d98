package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact dup of 1
    (3L, "alpha  beta gamma delta epsilon zeta eta theta iota KAPPA"), // normalized dup of 1
    (4L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // near dup of 1
    (5L, "one two three four five six seven eight nine ten"),
    (6L, "totally different words describing some other subject entirely now"))
    .toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates under min id") {
    val groups = Dedup.exact(docs, "text", "doc_id").collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("keep_id") == 1L)
    assert(groups(0).getAs[Long]("n_copies") == 3L)
    assert(groups(0).getSeq[Long](groups(0).fieldIndex("ids")) == Seq(1L, 2L, 3L))
  }

  test("exact dedup bounds the id list: huge duplicate group, exact count, capped ids") {
    // a 100k-copy fingerprint must not buffer the whole group's ids —
    // the list is the min-`maxIds` ids via the bounded heap, the count
    // stays exact
    val many = spark.range(0, 100000).toDF("doc_id")
      .withColumn("text", lit("the same boilerplate document"))
    val g = Dedup.exact(many, "text", "doc_id", maxIds = 10).collect()
    assert(g.length == 1)
    assert(g(0).getAs[Long]("n_copies") == 100000L)
    assert(g(0).getAs[Long]("keep_id") == 0L)
    assert(g(0).getSeq[Long](g(0).fieldIndex("ids")) == (0L until 10L))
  }

  test("dropExactDuplicates keeps one row per content group") {
    val kept = Dedup.dropExactDuplicates(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L, 6L))
  }

  test("dropNearDuplicatesBest keeps the top-scoring member per component") {
    val scored = Seq(
      (1L, "a", 10.0), (2L, "b", 30.0), (3L, "c", 30.0), // component {1,2,3}
      (10L, "d", 5.0), (11L, "e", 4.0),                  // component {10,11}
      (99L, "f", 1.0))                                   // unpaired
      .toDF("doc_id", "text", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = Dedup.dropNearDuplicatesBest(scored, pairs, "doc_id", "score")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // {1,2,3}: max score 30 shared by 2 and 3 → min id 2; {10,11}: 10
    assert(kept == Seq(2L, 10L, 99L))
  }

  test("minhash LSH finds the near-dup pair and not unrelated pairs") {
    val pairs = Dedup.minHashLsh(docs, "text", "doc_id",
      numHashes = 64, bands = 16, minJaccard = 0.3).collect()
    val pairSet = pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairSet.contains((1L, 2L)), s"exact dup pair missing from $pairSet")
    assert(pairSet.contains((1L, 4L)) || pairSet.contains((2L, 4L)),
      s"near dup pair missing from $pairSet")
    assert(!pairSet.exists { case (a, b) => b == 5L || b == 6L || a == 5L || a == 6L },
      s"unrelated docs must not pair: $pairSet")
  }

  test("simhash pairs near-dups within hamming budget") {
    val pairs = Dedup.simHash(docs, "text", "doc_id", maxHamming = 8).collect()
    val pairSet = pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairSet.contains((1L, 2L)))
    assert(!pairSet.exists { case (a, b) => a == 6L || b == 6L })
  }

  test("adaptive banding keeps full recall at the requested hamming radius") {
    // Hamming-10 pair with the 10 differing bits spread across ALL four
    // 16-bit quadrants — the fixed 4 × 16-bit banding shares no chunk and
    // silently misses it (the round-2 recall gap); banding at
    // maxHamming + 1 = 11 chunks must find it (pigeonhole: 10 diffs
    // cannot dirty 11 chunks).
    val a = 0L
    val b = Seq(0, 1, 2, 16, 17, 18, 32, 33, 34, 48).map(1L << _).reduce(_ | _)
    assert(java.lang.Long.bitCount(a ^ b) == 10)
    val sigs = Seq((1L, a), (2L, b)).toDF("id", "sim")
    // fixed 4-chunk keys: all four differ → no candidate, the pair is lost
    val keys = sigs.select(graft.functions.Sketches.simhashChunks(col("sim"), 4).as("ks"))
      .as[Seq[Long]].collect()
    assert(keys(0).zip(keys(1)).forall { case (x, y) => x != y },
      "crafted pair must defeat the 4-chunk banding for this test to bite")
    val got = Dedup.simHashFromSigs(sigs, maxHamming = 10).collect()
    assert(got.length == 1 && got.head.getAs[Int]("hamming") == 10,
      s"adaptive banding must recover the hamming-10 pair, got ${got.toSeq}")
    // and the radius is honored: the same pair is out of budget at 9
    assert(Dedup.simHashFromSigs(sigs, maxHamming = 9).isEmpty)
  }

  test("ngram jaccard exact pairs match hand-computed values") {
    val pairs = Dedup.ngramJaccard(docs, "text", "doc_id", n = 3, minJaccard = 0.2)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("jaccard"))).toMap
    assert(pairs(((1L, 2L))) == 1.0)
    // docs 1 vs 4: 8 shingles each, 7 shared → 7/9
    assert(math.abs(pairs(((1L, 4L))) - 7.0 / 9.0) < 1e-3)
  }

  test("dedupLines drops boilerplate lines by document frequency, keeps order and blanks") {
    val docs2 = Seq(
      (1L, "COMMON HEADER\nunique alpha\n\nshared tail"),
      (2L, "common header\nunique beta\nshared tail"),
      (3L, "Common Header\nunique gamma\nshared tail"),
      (4L, "totally unique document"))
      .toDF("doc_id", "text")
    // header appears in 3 docs (normalized), tail in 3 → both dropped at
    // maxDocFreq=2; unique lines and the blank line survive in order
    val got = Dedup.dedupLines(docs2, "text", "doc_id", maxDocFreq = 2)
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(got == Seq("unique alpha\n", "unique beta", "unique gamma", "totally unique document"))
    // at maxDocFreq=3 nothing is hot → texts unchanged (roundtrip fidelity)
    val same = Dedup.dedupLines(docs2, "text", "doc_id", maxDocFreq = 3)
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(same == docs2.orderBy("doc_id").collect().map(_.getString(1)).toSeq)
  }

  test("dedupLinesInDoc keeps first occurrences and blanks, row-locally") {
    val docs2 = Seq(
      (1L, "Nav Bar\nbody text\nnav bar\n\n\nFooter\nfooter\nFooter"),
      (2L, "only one line"),
      (3L, ""))
      .toDF("doc_id", "text")
    val got = Dedup.dedupLinesInDoc(docs2, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[String]("text"), r.getAs[Long]("n_lines_dropped"))).toSeq
    // case-insensitive repeats drop, both blank lines survive, order kept
    assert(got(0) == (("Nav Bar\nbody text\n\n\nFooter", 3L)))
    assert(got(1) == (("only one line", 0L)))
    assert(got(2) == (("", 0L)))
    // idempotent: a clean doc round-trips
    val again = Dedup.dedupLinesInDoc(
      Seq((1L, got(0)._1)).toDF("doc_id", "text"), "text", "doc_id")
      .collect().head
    assert(again.getAs[String]("text") == got(0)._1 &&
      again.getAs[Long]("n_lines_dropped") == 0L)
  }

  test("dedupSpans removes cross-document repeated windows except in the keeper") {
    val boiler = "all rights reserved no part may be reproduced without permission"
    val docs2 = Seq(
      (1L, s"intro words for doc one $boiler ending one"),
      (2L, s"different opening here for two $boiler closing two"),
      (3L, s"third unrelated document body text $boiler"),
      (4L, "completely original content with no shared spans at all here"))
      .toDF("doc_id", "text")
    val got = Dedup.dedupSpans(docs2, "text", "doc_id", n = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[String]("text"), r.getAs[Long]("n_tokens_dropped"))).toSeq
    // doc 1 is the min-id keeper for every boiler window → untouched
    assert(got(0) == ((s"intro words for doc one $boiler ending one", 0L)))
    // docs 2/3: the 10 boiler tokens are covered by the union of the
    // three fully-inside windows; straddling windows are doc-unique
    assert(got(1) == (("different opening here for two closing two", 10L)))
    assert(got(2) == (("third unrelated document body text", 10L)))
    assert(got(3) == (("completely original content with no shared spans at all here", 0L)))
  }

  test("dedupSpans: no false sharing, case-insensitive match, short docs pass through") {
    val docs2 = Seq(
      (1L, "One Two Three Four Five Six Seven Eight tail-a"),
      (2L, "one two three four five six seven eight tail-b"), // same 8-window, lowered
      (3L, "short doc"),
      (4L, ""))
      .toDF("doc_id", "text")
    val got = Dedup.dedupSpans(docs2, "text", "doc_id", n = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[String]("text"), r.getAs[Long]("n_tokens_dropped"))).toSeq
    assert(got(0) == (("One Two Three Four Five Six Seven Eight tail-a", 0L)))
    assert(got(1) == (("tail-b", 8L)))
    assert(got(2) == (("short doc", 0L)))
    assert(got(3) == (("", 0L)))
    // raising maxDocFreq above the sharing degree leaves everything intact
    val lax = Dedup.dedupSpans(docs2, "text", "doc_id", n = 8, maxDocFreq = 2)
      .orderBy("doc_id").collect().map(_.getAs[Long]("n_tokens_dropped")).toSeq
    assert(lax == Seq(0L, 0L, 0L, 0L))
  }

  test("dedupSpans matches a brute-force reference on randomized corpora") {
    val rnd = new scala.util.Random(20260813L)
    val vocab = Vector("a", "b", "c", "d", "e")
    val n = 3
    // tiny vocab + short docs → heavy genuine window sharing, plus the
    // degenerate shapes: empty docs, docs shorter than n, exact length n
    val docs2 = (0 until 50).map { i =>
      val len = rnd.nextInt(10) // 0..9 tokens
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = Dedup.dedupSpans(docs2.toDF("doc_id", "text"), "text", "doc_id", n = n)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[String]("text"), r.getAs[Long]("n_tokens_dropped"))).toSeq
    // brute force: windows per doc, dup keys by distinct-doc count, min-id
    // keeper, coverage union, rebuild
    val toks = docs2.map { case (id, t) =>
      id -> (if (t.trim.isEmpty) Array("") else t.trim.split("\\s+"))
    }.toMap
    val wins = docs2.flatMap { case (id, _) =>
      val w = toks(id)
      if (w.length < n) Seq.empty
      else (0 to w.length - n).map(p => (id, p, w.slice(p, p + n).mkString(" ").toLowerCase))
    }
    val keeper = wins.groupBy(_._3).collect {
      case (k, occ) if occ.map(_._1).distinct.size > 1 => k -> occ.map(_._1).min
    }
    val want = docs2.map { case (id, _) =>
      val w = toks(id)
      val cov = wins.filter(x => x._1 == id && keeper.get(x._3).exists(_ != id))
        .flatMap(x => x._2 until x._2 + n).toSet
      val kept = w.zipWithIndex.collect { case (t, i) if !cov.contains(i) => t }
      (kept.mkString(" "), cov.size.toLong)
    }
    assert(got == want)
  }

  test("dedupSpans survives a pathological corpus-wide duplicate") {
    // 20k copies of one 20-token document: every window is hot in every
    // copy — the worst skew case. Detection is a partial-aggregable
    // groupBy and coverage stays per-doc, so this must just work: keeper
    // (id 0) intact, every other copy fully stripped.
    val text = (1 to 20).map(i => s"tok$i").mkString(" ")
    val many = spark.range(0, 20000).toDF("doc_id")
      .withColumn("text", lit(text))
    val out = Dedup.dedupSpans(many, "text", "doc_id", n = 8)
    val agg = out.groupBy(col("n_tokens_dropped")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(agg == Map(0L -> 1L, 20L -> 19999L))
    val keeper = out.where(col("n_tokens_dropped") === 0L).collect()
    assert(keeper.length == 1 && keeper(0).getAs[Long]("doc_id") == 0L &&
      keeper(0).getAs[String]("text") == text)
  }

  test("dedupSpans: hashed keys (the scale knob) equal the string-key path") {
    val rnd = new scala.util.Random(99L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val boiler = "shared footer sentence repeated across many documents verbatim here"
    val docs2 = (0 until 40).map { i =>
      val body = Seq.fill(12 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
      (i.toLong, if (i % 3 == 0) s"$body $boiler" else body)
    }.toDF("doc_id", "text")
    def run(h: Boolean) = Dedup.dedupSpans(docs2, "text", "doc_id",
      n = 8, hashKeys = h).orderBy("doc_id").collect()
      .map(r => (r.getAs[String]("text"), r.getAs[Long]("n_tokens_dropped"))).toSeq
    assert(run(true) == run(false))
    // sanity: the injected boilerplate really was deduplicated
    assert(run(false).count(_._2 > 0) >= 12)
  }

  test("canonicalUrl is idempotent over randomized messy URLs") {
    import graft.functions.TextFunctions.canonicalUrl
    val rnd = new scala.util.Random(42)
    val schemes = Seq("http", "HTTP", "https", "HTTPS", "ftp")
    val hosts = Seq("www.Ex.COM", "ex.com", "A.b.C.org:80", "x.io:443", "y.z:8080")
    val paths = Seq("", "/", "/a", "/a/b/", "/a//", "/a.b")
    val queries = Seq("", "?a=1", "?b=2&a=1", "?utm_source=f&a=1", "?fbclid=Z", "?z&a=1")
    val frags = Seq("", "#x", "#a/b?c=1")
    val urls = (0 until 300).map { i =>
      (i.toLong, schemes(rnd.nextInt(schemes.size)) + "://" +
        hosts(rnd.nextInt(hosts.size)) + paths(rnd.nextInt(paths.size)) +
        queries(rnd.nextInt(queries.size)) + frags(rnd.nextInt(frags.size)))
    }.toDF("id", "url")
    val once = urls.select(col("id"), canonicalUrl(col("url")).as("url"))
    val twice = once.select(col("id"), canonicalUrl(col("url")).as("url"))
    val a = once.orderBy("id").collect().map(_.getString(1)).toSeq
    val b = twice.orderBy("id").collect().map(_.getString(1)).toSeq
    assert(a == b)
  }

  test("ngramJaccardViaLsh: LSH candidates + exact verify agree with the exact path") {
    // with 16 bands × 4 rows the S-curve knee sits far below J=0.3 —
    // recall on this fixture is total, so the composed path must equal
    // the exact all-pairs computation
    val exact = Dedup.ngramJaccard(docs, "text", "doc_id", minJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaLsh = Dedup.ngramJaccardViaLsh(docs, "text", "doc_id",
      numHashes = 64, bands = 16, minJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaLsh == exact, s"composed path must reproduce exact pairs: $viaLsh vs $exact")
  }

  test("connected components group transitive near-dup pairs") {
    // chain 1-2-3, pair 10-11, isolated edge 20-21; 5 is untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps(1L) == 1L && comps(2L) == 1L && comps(3L) == 1L)
    assert(comps(10L) == 10L && comps(11L) == 10L)
    assert(comps(20L) == 20L && comps(21L) == 20L)

    val corpus = Seq(1L, 2L, 3L, 5L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val kept = Dedup.dropNearDuplicates(corpus, pairs, "doc_id")
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 5L, 10L, 20L))
  }

  test("connected components: constant plan depth across rounds (lineage checkpointed)") {
    // a long chain is the worst case for plain propagation (O(diameter));
    // pointer jumping must collapse it in O(log diameter) rounds
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(chain, maxIter = 12)
    // every vertex collapses to component 0
    assert(comps.agg(max(col("component"))).head().getLong(0) == 0L)
    // the returned plan must hang off checkpointed blocks, not 30 rounds
    // of joins: a handful of nodes, not hundreds
    val planSize = comps.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(planSize < 10, s"plan depth must not grow with iterations (got $planSize nodes)")
  }

  test("dedup candidate plans contain no Window operator (bucket cap is groupBy+join)") {
    val lshPlan = Dedup.minHashLsh(docs, "text", "doc_id", numHashes = 32, bands = 8)
      .queryExecution.optimizedPlan
    val simPlan = Dedup.simHash(docs, "text", "doc_id")
      .queryExecution.optimizedPlan
    Seq("minHashLsh" -> lshPlan, "simHash" -> simPlan).foreach { case (name, plan) =>
      val windows = plan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      assert(windows.isEmpty, s"$name must not buffer buckets in a Window: $plan")
    }
  }

  test("minhash pairs → components → dedup end-to-end") {
    val pairs = Dedup.minHashLsh(docs, "text", "doc_id",
      numHashes = 64, bands = 16, minJaccard = 0.3)
    val kept = Dedup.dropNearDuplicates(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // 1,2,3 are exact/near dups of each other; 4 is a near dup of 1 → one
    // representative (1) survives from {1,2,3,4}; 5 and 6 pass through
    assert(kept == Seq(1L, 5L, 6L), kept.toString)
  }

  test("containment dedup: word-aligned verbatim inclusion, nothing else") {
    val docs = Seq(
      (1L, "The quick   brown fox jumps"),      // contained in 2
      (2L, "x the Quick brown fox jumps y"),
      (3L, "completely unrelated words here now"),
      (4L, "quick brown fox jumps"),            // contained in 1 and 2
      (5L, "a b c d"),
      (6L, "xa b c de"))                        // chars match, words don't
      .toDF("doc_id", "text")
    val got = Dedup.containment(docs, "text", "doc_id", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (4L, 1L), (4L, 2L)),
      s"expected word-aligned containments only (5 in 6 is a char-level trap): $got")
  }

  test("containment maxShingleDf cap skips boilerplate-rarest inner docs; audit measures it") {
    // docs 1/2/4 share every shingle of doc 4 (df ≥ 3-ish); doc 4's
    // rarest shingle df = 3 → a cap of 2 skips doc 4 as an inner
    // candidate while 1-in-2 (rarest df 2) survives
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "x the quick brown fox jumps y"),
      (3L, "completely unrelated words here now"),
      (4L, "the quick brown fox"))
      .toDF("doc_id", "text")
    val exact = Dedup.containment(docs, "text", "doc_id", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((1L, 2L), (4L, 1L), (4L, 2L)))
    val capped = Dedup.containment(docs, "text", "doc_id", k = 4, maxShingleDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)), s"cap should drop doc 4's pairs: $capped")
    val audit = Dedup.containmentAudit(docs, "text", "doc_id", k = 4,
      maxShingleDf = 2).collect()(0)
    assert(audit.getLong(0) == 3L && audit.getLong(1) == 1L) // exact, capped
    assert(audit.getLong(2) == 1L)                           // doc 4 skipped
    assert(audit.getLong(3) == 333L)                         // 1000/3
  }

  test("decontaminate flags corpus docs overlapping the benchmark set") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over lazy dogs"),
      (2L, "completely unrelated text about spark engines"),
      (3L, "quick brown fox appears here too today")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "watch the quick brown fox benchmark item")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, bench, "text", "doc_id", n = 3)
      .orderBy("id").collect()
    // docs 1 and 3 share the shingle "quick brown fox" with the benchmark
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(out.forall(r => r.getLong(1) >= 1 && r.getLong(2) == 1L))
  }

  test("decontaminateFuzzy agrees with a brute-force Jaccard scan on randomized data") {
    val rnd = new scala.util.Random(20260814L)
    val vocab = Vector("apple", "bear", "cat", "dog", "echo", "fog", "gnu", "hat")
    def doc() = Seq.fill(6 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val all = Seq.tabulate(120)(i => (i.toLong, doc()))
    // plant near-copies of benchmark docs into the corpus (one word edited)
    val planted = all.filter(_._1 % 10 == 0).map { case (id, t) =>
      val ws = t.split(" "); ws(ws.length - 1) = "zzz"
      (id + 1000L, ws.mkString(" "))
    }
    val corpusRows = all.filterNot(_._1 % 10 == 0) ++ planted
    val benchRows = all.filter(_._1 % 10 == 0)
    val corpus = corpusRows.toDF("doc_id", "text")
    val bench = benchRows.toDF("doc_id", "text")
    val minJ = 0.4
    val got = Dedup.decontaminateFuzzy(corpus, bench, "text", "doc_id",
      n = 3, minJaccard = minJ, maxShingleDf = 10000)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // brute force over all (corpus, bench) pairs
    def shingleSet(t: String): Set[String] = {
      val ws = t.trim.split("\\s+").toSeq
      (0 to math.max(ws.length - 3, 0)).map(i => ws.slice(i, math.min(i + 3, ws.length)).mkString(" ")).toSet
    }
    val want = corpusRows.flatMap { case (cid, ct) =>
      val cs = shingleSet(ct)
      val js = benchRows.map { case (_, bt) =>
        val bs = shingleSet(bt)
        val inter = (cs & bs).size
        inter.toDouble / (cs.size + bs.size - inter)
      }.filter(_ >= minJ)
      if (js.isEmpty) None
      else Some(cid -> ((BigDecimal(js.max).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        js.size.toLong)))
    }.toMap
    assert(got == want, s"got ${got.size} flagged vs ${want.size}")
    assert(want.nonEmpty && planted.forall(p => want.contains(p._1)),
      "planted near-copies must be flagged")
  }

  test("embedding cosine dedup finds planted near-identical vectors") {
    val v = Array.tabulate(16)(i => math.cos(i + 1).toFloat)
    val near = v.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.001f else x }
    val orth = Array.tabulate(16)(i => (if (i % 2 == 0) 1f else -1f) * math.cos(i).toFloat)
    val df = Seq((10L, v.toSeq), (11L, near.toSeq), (12L, orth.toSeq))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingCosine(df, "embedding", "vec_id", minCosine = 0.99)
      .collect()
    assert(pairs.length == 1)
    assert((pairs(0).getAs[Long]("id_a"), pairs(0).getAs[Long]("id_b")) == (10L, 11L))
    assert(pairs(0).getAs[Double]("cosine") > 0.999)
  }

  test("dropSeenDuplicates: seen content dropped, batch deduped, unseen kept") {
    import graft.functions.TextFunctions
    val seen = Seq("already ingested doc", "another   OLD one")
      .toDF("text").select(TextFunctions.fingerprint64(col("text")).as("fp"))
    val batch = Seq(
      (10L, "already ingested doc"),     // seen → dropped
      (11L, "Another old ONE"),          // seen modulo normalization → dropped
      (12L, "brand new content"),        // unseen → kept
      (13L, "brand  NEW content"),       // in-batch dup of 12 → dropped
      (14L, "also fresh")                // unseen singleton → kept
    ).toDF("doc_id", "text")
    val out = Dedup.dropSeenDuplicates(batch, seen, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(12L, 14L))
  }

  test("tfidfCosine equals a scalar replay on randomized docs") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docs = (0L until 40L).map { i =>
      val n = rnd.nextInt(12) + 3
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val p = 700; val cap = 25
    val got = Dedup.tfidfCosine(docs.toDF("doc_id", "text"), "text", "doc_id",
      minCosPermille = p, maxTermDf = cap)
      .select("id_a", "id_b", "dot", "na", "nb")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

    // scalar replay with the identical quantization
    val corpus = docs.toMap.view.mapValues(_.toLowerCase.split(" ", -1).toSeq).toMap
    val nd = corpus.size.toDouble
    val tf = corpus.map { case (id, ts) =>
      id -> ts.groupBy(identity).view.mapValues(_.size.toLong).toMap }
    val dfq = tf.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 <= cap).toMap
    val wq = tf.map { case (id, m) =>
      id -> m.collect { case (t, c) if dfq.contains(t) =>
        t -> math.floor(c.toDouble * (math.log((nd + 1.0) / (dfq(t) + 1.0)) + 1.0)
          * 1000.0 + 0.5).toLong
      }.toMap
    }
    val want = (for {
      a <- corpus.keys; b <- corpus.keys if a < b
      shared = wq(a).keySet intersect wq(b).keySet if shared.nonEmpty
      dot = shared.toSeq.map(t => wq(a)(t) * wq(b)(t)).sum
      na = wq(a).values.map(v => v * v).sum
      nb = wq(b).values.map(v => v * v).sum
      if BigInt(1000000) * BigInt(dot) * BigInt(dot) >=
        BigInt(p.toLong * p) * BigInt(na) * BigInt(nb)
    } yield (a, b, dot, na, nb)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.nonEmpty, "degenerate test: no pairs cleared the threshold")
  }

  test("nearDupIngest: batch screened against the persisted index, survivors appended") {
    val idx = java.nio.file.Files.createTempDirectory("neardup").toString + "/idx"
    def run(rows: Seq[(Long, String)]): Seq[Long] =
      Dedup.nearDupIngest(rows.toDF("doc_id", "text"), idx, "text", "doc_id",
        numHashes = 64, bands = 16, minJaccard = 0.5)
        .select("doc_id").as[Long].collect().sorted.toSeq

    val base = "the quick brown fox jumps over the lazy dog again and again today"
    // batch 1 into the empty index: everything survives
    assert(run(Seq(1L -> base, 2L -> "completely different material about spark joins and shuffles")) ==
      Seq(1L, 2L))
    // batch 2: doc 1 plus a trailing word (shingle Jaccard ~0.9) dies
    // against the index; a fresh doc survives
    assert(run(Seq(10L -> (base + " ok"), 11L -> "yet another unrelated piece of text entirely here")) ==
      Seq(11L))
    // batch 3: a near-copy of batch 2's SURVIVOR dies too — proving the
    // survivors' signatures were appended, not just the seed batch's
    assert(run(Seq(20L -> "so yet another unrelated piece of text entirely here")) ==
      Seq.empty)
  }
}
