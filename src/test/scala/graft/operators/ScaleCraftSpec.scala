package graft.operators

import graft.SparkSpec
import graft.functions.KmvDistinct.kmvDistinct
import org.apache.spark.sql.functions._

class ScaleCraftSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join result under heavy skew") {
    // 10k rows of one hot key + a tail
    val big = ((0 until 10000).map(i => (1L, i.toLong)) ++
      (0 until 100).map(i => (i.toLong + 2, i.toLong)))
      .toDF("k", "payload")
    val small = (1L to 50L).map(k => (k, s"dim-$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k"))
    val salted = SkewJoin.saltedInnerJoin(big, small, Seq("k"), saltFactor = 8)
    assert(salted.count() == plain.count())
    val a = salted.groupBy("k").count().orderBy("k").as[(Long, Long)].collect().toSeq
    val b = plain.groupBy("k").count().orderBy("k").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("bucketed tables join without a shuffle exchange") {
    val n = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
      (0 until 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "va")
        .write.bucketBy(8, "k").sortBy("k").saveAsTable("bkt_a")
      (0 until 1000).map(i => (i.toLong, s"s$i")).toDF("k", "vb")
        .write.bucketBy(8, "k").sortBy("k").saveAsTable("bkt_b")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), Seq("k"))
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be shuffle-free:\n${plan.take(1200)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", n)
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("frequent_items finds heavy hitters across partition merges") {
    import graft.functions.FrequentItems.frequentItems
    // 30% "spam", 20% "boiler", rest spread over 5000 rare tokens
    val rows = (0 until 50000).map { i =>
      if (i % 10 < 3) "spam" else if (i % 10 < 5) "boiler" else s"rare-${i % 5000}"
    }
    val df = rows.toDF("term").repartition(8)
    val got = df.agg(frequentItems(col("term"), 32).as("hh"))
      .head().getAs[Map[String, Long]](0)
    assert(got.contains("spam") && got.contains("boiler"),
      s"heavy hitters missing: ${got.keys.take(10)}")
    // guaranteed-presence bound: estimates undercount by at most N/k
    assert(got("spam") > 15000 - 50000 / 32)
    assert(got("spam") > got.getOrElse("boiler", 0L))
  }

  test("corpus stats: one-pass nulls/minmax/ndv per column") {
    val df = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val stats = CorpusStats.collect(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val n = df.count()
    assert(stats.values.forall(_.getLong(1) == n))
    val keyStats = stats("o_orderkey")
    assert(keyStats.getLong(2) == 0L) // no nulls
    assert(math.abs(keyStats.getLong(3) - n).toDouble / n < 0.1, keyStats.toString)
    assert(stats("o_orderstatus").getLong(3) == 3L) // exact below k
    assert(stats("o_orderstatus").getString(4) == "F")
    assert(stats("o_orderstatus").getString(5) == "P")
  }

  test("kmv_distinct estimates distinct counts within a few percent") {
    val df = (0 until 50000).map(i => (i % 7, s"user-${i % 9173}"))
      .toDF("grp", "u").repartition(8) // force partial-agg merges
    val got = df.groupBy("grp").agg(kmvDistinct(col("u"), 1024).as("est"))
      .orderBy("grp").as[(Int, Long)].collect()
    val exact = df.groupBy("grp").agg(countDistinct(col("u")).as("d"))
      .orderBy("grp").as[(Int, Long)].collect().toMap
    got.foreach { case (g, est) =>
      val ex = exact(g).toDouble
      assert(math.abs(est - ex) / ex < 0.1, s"grp $g: est $est vs exact $ex")
    }
    // below k the sketch is exact
    val small = (0 until 500).map(i => s"v$i").toDF("u")
    assert(small.agg(kmvDistinct(col("u"), 1024)).as[Long].head() == 500L)
  }

  test("unigramDrift matches a plain-Scala KL replay and signs the drift") {
    val a = Seq("cat cat dog", "cat fish", "dog cat").toDF("text")
    val b = Seq("dog dog bird", "bird bird dog", "fish").toDF("text")
    val got = CorpusStats.unigramDrift(a, b, "text", topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // independent replay: Laplace smoothing over the union vocabulary
    val ca = Map("cat" -> 4L, "dog" -> 2L, "fish" -> 1L)
    val cb = Map("dog" -> 3L, "bird" -> 3L, "fish" -> 1L)
    val vocab = (ca.keySet ++ cb.keySet).toSeq.sorted
    val (ta, tb, v) = (7.0, 7.0, vocab.size.toDouble)
    val want = vocab.map { t =>
      val pa = (ca.getOrElse(t, 0L).toDouble + 1.0) / (ta + v)
      val pb = (cb.getOrElse(t, 0L).toDouble + 1.0) / (tb + v)
      (t, ca.getOrElse(t, 0L), cb.getOrElse(t, 0L),
        math.floor(1e6 * (pa * math.log(pa / pb)) + 0.5).toLong)
    }.sortBy(x => (-x._4, x._1))
    assert(got.toSeq == want)
    // signs: the A-only term drives positive drift, the B-only negative
    val byTerm = got.map(r => r._1 -> r._4).toMap
    assert(byTerm("cat") > 0 && byTerm("bird") < 0)
    // corpus-level KL(A||B) is the exact integer sum of the column
    assert(got.map(_._4).sum == want.map(_._4).sum)
  }
}
