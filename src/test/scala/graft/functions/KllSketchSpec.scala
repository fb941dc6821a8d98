package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KllSketchSpec extends SparkSpec {
  import spark.implicits._

  private val k = 64

  /** Plain-Scala replay: the escalation-minimal level and its exact
    * survivor counts — the pure function the aggregate must equal.
    */
  private def reference(values: Seq[Long], cap: Int): (Int, Map[Long, Long]) = {
    val counts = values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def survivors(l: Int): Set[Long] = counts.keySet.filter { v =>
      java.lang.Long.numberOfTrailingZeros(Sketches.splitmix64(v)) >= l
    }
    var l = 0
    while (survivors(l).size > cap) l += 1
    (l, survivors(l).map(v => v -> counts(v)).toMap)
  }

  private def refBlob(values: Seq[Long], cap: Int): Seq[Byte] = {
    val (l, m) = reference(values, cap)
    val vs = m.keys.toArray.sorted
    val bb = java.nio.ByteBuffer.allocate((4 + 2 * vs.length) * 8)
    bb.putLong(cap.toLong).putLong(l.toLong).putLong(values.size.toLong)
      .putLong(vs.length.toLong)
    vs.foreach(v => bb.putLong(v).putLong(m(v)))
    bb.array().toSeq
  }

  // deterministic skewed multiset: geometric-ish tail + heavy hitters
  private val corpus: Seq[Long] = {
    val tail = (1 to 900).map(i => (Sketches.splitmix64(i.toLong) % 10000L).abs)
    val heavy = Seq.fill(400)(42L) ++ Seq.fill(150)(7777L)
    tail ++ heavy
  }

  private def buildBlob(values: Seq[Long], parts: Int, cap: Int = k): Seq[Byte] =
    values.toDF("v").repartition(parts)
      .agg(KllSketch.kll(col("v"), cap).as("sk"))
      .collect().head.getAs[Array[Byte]](0).toSeq

  test("the blob is a pure function of the multiset, at any partitioning") {
    val expected = refBlob(corpus, k)
    Seq(1, 4, 17).foreach { parts =>
      assert(buildBlob(corpus, parts) == expected,
        s"blob diverged from the replay at $parts partitions")
    }
  }

  test("stored sketches roll up bit-identically to the direct build, any chop") {
    val direct = buildBlob(corpus, 8)
    // chop the multiset into fine groups three different ways, persist
    // the fine blobs conceptually (collect), then kllMerge the rollup
    Seq(3, 7, 25).foreach { nGroups =>
      val rolled = corpus.zipWithIndex
        .map { case (v, i) => (i % nGroups, v) }.toDF("fine", "v")
        .groupBy("fine").agg(KllSketch.kll(col("v"), k).as("sk"))
        .agg(KllSketch.kllMerge(col("sk"), k).as("sk"))
        .collect().head.getAs[Array[Byte]](0).toSeq
      assert(rolled == direct, s"rollup diverged at $nGroups fine groups")
    }
    // ...including a merge OF merged blobs (two-tier rollup)
    val twoTier = corpus.zipWithIndex
      .map { case (v, i) => (i % 12, i % 3, v) }.toDF("fine", "mid", "v")
      .groupBy("fine", "mid").agg(KllSketch.kll(col("v"), k).as("sk"))
      .groupBy("mid").agg(KllSketch.kllMerge(col("sk"), k).as("sk"))
      .agg(KllSketch.kllMerge(col("sk"), k).as("sk"))
      .collect().head.getAs[Array[Byte]](0).toSeq
    assert(twoTier == direct, "two-tier rollup diverged from the direct build")
  }

  test("quantile readout follows the exact integer rank rule; n_total stays exact") {
    val (level, m) = reference(corpus, k)
    val vs = m.keys.toArray.sorted
    val w = vs.map(v => BigInt(m(v)) << level).sum
    def refQ(pct: Int): Long = {
      var cum = BigInt(0)
      vs.find { v => cum += BigInt(m(v)) << level; cum * 100 >= BigInt(pct) * w }
        .get
    }
    val got = corpus.toDF("v")
      .agg(KllSketch.kll(col("v"), k).as("sk"))
      .select(
        KllSketch.kllQuantile(col("sk"), 25).as("q25"),
        KllSketch.kllQuantile(col("sk"), 50).as("q50"),
        KllSketch.kllQuantile(col("sk"), 99).as("q99"),
        KllSketch.kllN(col("sk")).as("n"))
      .collect().head
    assert(got.getLong(0) == refQ(25))
    assert(got.getLong(1) == refQ(50))
    assert(got.getLong(2) == refQ(99))
    assert(got.getLong(3) == corpus.size.toLong,
      "n_total must be the exact input count")
  }

  test("estimates track exact ranks on spread-count data (the stated use case)") {
    // the length/score-distribution shape: many distinct values, small
    // per-value counts — where the O(1/sqrt(k)) rank error applies
    // (KllSketch scaladoc states the heavy-point-mass caveat explicitly)
    val spread = (1 to 3000).flatMap { i =>
      val v = (Sketches.splitmix64(i.toLong * 7919L) % 100000L).abs
      Seq.fill(1 + (i % 3))(v)
    }
    val got = spread.toDF("v")
      .agg(KllSketch.kll(col("v"), 256).as("sk"))
      .select(
        KllSketch.kllQuantile(col("sk"), 25).as("q25"),
        KllSketch.kllQuantile(col("sk"), 50).as("q50"),
        KllSketch.kllQuantile(col("sk"), 90).as("q90"))
      .collect().head
    val sortedAll = spread.sorted
    def exactRankPct(v: Long): Double =
      sortedAll.count(_ <= v).toDouble * 100.0 / sortedAll.size
    Seq(25 -> got.getLong(0), 50 -> got.getLong(1), 90 -> got.getLong(2))
      .foreach { case (pct, est) =>
        assert(math.abs(exactRankPct(est) - pct) <= 10.0,
          s"q$pct estimate $est sits at exact rank ${exactRankPct(est)}%")
      }
  }

  test("kll_rank_milli locates probes by the exact integer rank rule") {
    val (level, m) = reference(corpus, k)
    val vs = m.keys.toArray.sorted
    val w = vs.map(v => BigInt(m(v)) << level).sum
    def refRank(p: Long): Long =
      ((vs.filter(_ <= p).map(v => BigInt(m(v)) << level).sum * 1000) / w)
        .toLong
    val sk = corpus.toDF("v").agg(KllSketch.kll(col("v"), k).as("sk"))
    val probes = Seq(0L, 42L, 5000L, 999999L)
    val got = probes.toDF("p").crossJoin(sk)
      .select(col("p"), KllSketch.kllRankMilli(col("sk"), col("p")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    probes.foreach { p =>
      assert(got(p) == refRank(p), s"rank diverged at probe $p")
    }
    assert(got(999999L) == 1000L, "a probe above every value ranks 1000")
    // the median's own rank sits near 500 by construction
    val q50 = corpus.toDF("v").agg(KllSketch.kll(col("v"), k).as("sk"))
      .select(KllSketch.kllQuantile(col("sk"), 50)).collect().head.getLong(0)
    assert(math.abs(refRank(q50) - 500L) <= 60L)
  }

  test("empty and null-only inputs yield an empty sketch and NULL quantiles") {
    val got = Seq[Option[Long]](None, None).toDF("v")
      .agg(KllSketch.kll(col("v"), k).as("sk"))
      .select(KllSketch.kllQuantile(col("sk"), 50).as("q50"))
      .collect().head
    assert(got.isNullAt(0))
  }

  test("capacity mismatch on stored blobs fails loud; knobs guarded") {
    val fine = corpus.zipWithIndex.map { case (v, i) => (i % 3, v) }
      .toDF("fine", "v")
      .groupBy("fine").agg(KllSketch.kll(col("v"), 32).as("sk"))
    intercept[Exception] {
      fine.agg(KllSketch.kllMerge(col("sk"), k)).collect()
    }
    intercept[IllegalArgumentException] {
      KllSketch(exprOf(col("v")), k = 8)
    }
    intercept[IllegalArgumentException] {
      KllQuantileExpr(exprOf(col("v")), pct = 0)
    }
  }

  test("the kll aggregates are SQL-addressable and match the Column API") {
    corpus.toDF("v").createOrReplaceTempView("kll_sql_t")
    GraftFunctions.registerAll(spark)
    val sql = spark.sql(
      s"""SELECT kll_quantile(kll_merge(sk, $k), 50) AS q50 FROM (
         |  SELECT kll_sketch(v, $k) AS sk FROM kll_sql_t GROUP BY v % 5
         |)""".stripMargin).collect().head.getLong(0)
    val api = corpus.toDF("v")
      .agg(KllSketch.kll(col("v"), k).as("sk"))
      .select(KllSketch.kllQuantile(col("sk"), 50)).collect().head.getLong(0)
    assert(sql == api, "SQL rollup diverged from the Column API direct build")
  }
}
