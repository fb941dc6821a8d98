package graft.operators

import graft.SparkSpec
import graft.functions.Sketches
import org.apache.spark.sql.functions._

class SampleSynopsisSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int) =
    (1 to n).map(i => (i.toLong, s"src${i % 5}", (i % 97 + 1).toLong))
      .toDF("id", "source", "w")

  test("uniform sample is the k smallest unsigned hashes, ranked") {
    val df = fixture(300)
    val got = SampleSynopsis.uniform(df, "id", 10, Seq("id"))
      .select("rnk", "id").as[(Int, Long)].collect().toSeq
    val want = (1L to 300L)
      .sortBy(id => Sketches.splitmix64(id) ^ Long.MinValue)
      .take(10).zipWithIndex.map { case (id, i) => (i + 1, id) }
    assert(got == want)
  }

  test("rollup of per-source samples is BIT-IDENTICAL to the direct build") {
    val df = fixture(500)
    val perSource = df.groupBy(col("source"))
      .agg(SampleSynopsis.uniformAgg(col("id"), 16,
        "id" -> col("id"), "w" -> col("w")).as("smp"))
      .select(col("source"), posexplode(col("smp")).as(Seq("pos", "t")))
      .select(col("t.h").as("h"), col("t.id").as("id"), col("t.w").as("w"))
    val merged = SampleSynopsis.rollup(perSource, "h", 16, Seq("id", "w"))
      .select("rnk", "id", "w").collect().toSeq
    val direct = SampleSynopsis.uniform(df, "id", 16, Seq("id", "w"))
      .select("rnk", "id", "w").collect().toSeq
    assert(merged == direct)
  }

  test("sample is partitioning-invariant (pure function of the row set)") {
    val df = fixture(400)
    val a = SampleSynopsis.uniform(df.repartition(1), "id", 12, Seq("id"))
      .select("rnk", "id").collect().toSeq
    val b = SampleSynopsis.uniform(df.repartition(7), "id", 12, Seq("id"))
      .select("rnk", "id").collect().toSeq
    assert(a == b)
  }

  test("under capacity the sample is the whole set") {
    val df = fixture(8)
    val got = SampleSynopsis.uniform(df, "id", 20, Seq("id"))
      .select("id").as[Long].collect().toSet
    assert(got == (1L to 8L).toSet)
  }

  test("weighted: under capacity the DLT estimate is EXACT (tau = 0)") {
    val df = fixture(20) // k = 32 > 20 rows
    val got = SampleSynopsis.weighted(df, "id", "w", 32)
    assert(got.count() == 20)
    val est = got.select("est_total").distinct().as[Long].collect().toSeq
    val exact = df.agg(sum("w")).as[Long].collect().head
    assert(est == Seq(exact))
  }

  test("weighted: estimator tracks the true total on a larger set") {
    val df = fixture(5000)
    val exact = df.agg(sum("w")).as[Long].collect().head
    val est = SampleSynopsis.weighted(df, "id", "w", 64)
      .select("est_total").distinct().as[Long].collect().head
    // DLT with k=64: relative SE ~ 1/sqrt(k-1) ≈ 12.7%; allow 4 sigma
    assert(math.abs(est - exact).toDouble / exact < 0.5,
      s"estimate $est too far from $exact")
  }

  private def estimateJoin(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, k: Int): Long = {
    val base = java.nio.file.Files.createTempDirectory("jsyn").toString
    SampleSynopsis.buildJoinKeySynopsis(a, "key", s"$base/a", k)
    SampleSynopsis.buildJoinKeySynopsis(b, "key", s"$base/b", k)
    SampleSynopsis.joinSizeEstimate(spark, s"$base/a", s"$base/b", k)
      .as[Long].collect().head
  }

  test("join-size probe: complete synopses give the EXACT pair count") {
    val a = (1 to 30).map(i => (i.toLong % 10 + 1, i)).toDF("key", "x")
    val b = (1 to 20).map(i => (i.toLong % 10 + 6, i)).toDF("key", "x")
    // keys 6..10 shared: each 3 rows in a, 2 rows in b → 5·6 = 30
    assert(estimateJoin(a, b, 64) == 30L)
  }

  test("join-size probe: sampled estimate tracks the true join size") {
    val a = (1 to 4000).map(i => (i.toLong % 1500 + 1, i)).toDF("key", "x")
    val b = (1 to 3000).map(i => (i.toLong % 2000 + 500, i)).toDF("key", "x")
    val exact = a.groupBy("key").count().withColumnRenamed("count", "ca")
      .join(b.groupBy("key").count().withColumnRenamed("count", "cb"), "key")
      .agg(sum(col("ca") * col("cb"))).as[Long].collect().head
    val est = estimateJoin(a, b, 128)
    assert(math.abs(est - exact).toDouble / exact < 0.5,
      s"estimate $est too far from $exact")
  }

  test("matrix: grouped rollup of cell samples equals each slice's direct build") {
    // two dimensions: source (5 values) × band (3 values); cell table
    // holds per-(source, band) bottom-8 rows, then every
    // marginalization must match the direct sample of that slice.
    val df = fixture(600).withColumn("band", (col("id") % 3).cast("string"))
    val cells = df.groupBy(col("source"), col("band"))
      .agg(SampleSynopsis.uniformAgg(col("id"), 8,
        "id" -> col("id"), "w" -> col("w")).as("smp"))
      .select(col("source"), col("band"),
        posexplode(col("smp")).as(Seq("pos", "t")))
      .select(col("source"), col("band"), col("t.h").as("h"),
        col("t.id").as("id"), col("t.w").as("w"))
    def direct(keep: Seq[String]) =
      SampleSynopsis.explodeSample(
        df.groupBy(keep.map(col): _*).agg(
          SampleSynopsis.uniformAgg(col("id"), 8, "id" -> col("id")).as("smp")),
        "smp", keep, Seq("id"))
        .select((keep :+ "rnk" :+ "id").map(col): _*)
        .collect().toSeq
    for (keep <- Seq(Seq("source"), Seq("band"), Seq.empty[String])) {
      val rolled = SampleSynopsis.rollupBy(cells, "h", 8, keep, Seq("id"))
        .select((keep :+ "rnk" :+ "id").map(col): _*)
        .collect().toSeq
      assert(rolled.toSet == direct(keep).toSet,
        s"marginalization over keep=$keep not bit-identical")
    }
  }

  test("filtered join-size probe: complete synopses give the EXACT filtered count") {
    val base = java.nio.file.Files.createTempDirectory("jsynf").toString
    val a = (1 to 30).map(i => (i.toLong % 10 + 1, i)).toDF("key", "x")
    val b = (1 to 20).map(i => (i.toLong % 10 + 6, i)).toDF("key", "x")
    SampleSynopsis.buildJoinKeySynopsis(a, "key", s"$base/a", 64,
      Seq("cnt_even" -> (col("x") % 2 === 0)))
    SampleSynopsis.buildJoinKeySynopsis(b, "key", s"$base/b", 64)
    val est = SampleSynopsis.joinSizeEstimate(
      spark, s"$base/a", s"$base/b", 64, "cnt_even", "cnt")
      .as[Long].collect().head
    val exact = a.filter(col("x") % 2 === 0)
      .groupBy("key").count().withColumnRenamed("count", "ca")
      .join(b.groupBy("key").count().withColumnRenamed("count", "cb"), "key")
      .agg(sum(col("ca") * col("cb"))).as[Long].collect().head
    assert(est == exact, s"complete synopses must be exact: $est vs $exact")
  }

  test("join synopsis rollup of per-batch rows equals the direct build (any chop)") {
    val df = (1 to 3000).map(i => (i.toLong % 700 + 1, i)).toDF("key", "x")
    val direct = SampleSynopsis.joinKeySynopsisRows(df, "key", 64)
      .select("h", "key", "cnt").collect().toSet
    for (nChops <- Seq(2, 3, 5)) {
      val perBatch = (0 until nChops).map(c =>
        SampleSynopsis.joinKeySynopsisRows(
          df.filter(col("x") % nChops === c), "key", 64))
        .reduce(_ unionAll _)
      val rolled = SampleSynopsis.rollupJoinSynopsis(perBatch, 64)
        .select("h", "key", "cnt").collect().toSet
      assert(rolled == direct, s"chop into $nChops batches drifted")
    }
  }

  test("grouped join-size estimate: under-capacity groups are EXACT per group") {
    val a = (1 to 200).map(i => (i % 4, i.toLong % 10 + 1, i)).toDF("g", "key", "x")
    // +5 keeps key-parity compatible with side a per (g, key) — every
    // group genuinely overlaps
    val b = (1 to 100).map(i => (i % 4, i.toLong % 10 + 5, i)).toDF("g", "key", "x")
    val est = SampleSynopsis.joinSizeEstimateFrames(
      SampleSynopsis.joinKeySynopsisRows(a, "key", 64, keep = Seq("g")),
      SampleSynopsis.joinKeySynopsisRows(b, "key", 64, keep = Seq("g")), 64,
      keep = Seq("g"))
      .orderBy("g").select("g", "est_pairs").as[(Int, Long)].collect().toSeq
    val exact = a.groupBy("g", "key").count().withColumnRenamed("count", "ca")
      .join(b.groupBy("g", "key").count().withColumnRenamed("count", "cb"),
        Seq("g", "key"))
      .groupBy("g").agg(sum(col("ca") * col("cb")).as("e"))
      .orderBy("g").select("g", "e").as[(Int, Long)].collect().toSeq
    assert(est == exact, s"complete per-group synopses must be exact: $est vs $exact")
  }

  test("priority rollup of per-batch top-(k+1) rows is BIT-IDENTICAL; tau survives") {
    val df = fixture(800)
    val perSource = SampleSynopsis.explodePriority(
      df.groupBy(col("source"))
        .agg(SampleSynopsis.priorityAgg(col("id"), col("w"), 17).as("smp")),
      "smp", Seq("source"))
      .select("nq", "id", "w")
    val rolled = SampleSynopsis.rollupPriority(perSource, 17)
      .select("rnk", "nq", "id", "w").collect().toSeq
    val direct = SampleSynopsis.explodePriority(
      df.agg(SampleSynopsis.priorityAgg(col("id"), col("w"), 17).as("smp")),
      "smp", Seq.empty)
      .select("rnk", "nq", "id", "w").collect().toSeq
    assert(rolled == direct)
    // estimator agreement to the integer, including tau (rank 17)
    val ra = SampleSynopsis.priorityEstimate(
      SampleSynopsis.rollupPriority(perSource, 17), 16).as[Long].collect().head
    val da = SampleSynopsis.priorityEstimate(
      SampleSynopsis.explodePriority(
        df.agg(SampleSynopsis.priorityAgg(col("id"), col("w"), 17).as("smp")),
        "smp", Seq.empty), 16).as[Long].collect().head
    assert(ra == da)
  }

  test("weighted: higher weight wins at equal hash count (inclusion bias)") {
    // two strata, same size; heavy rows weight 1000, light rows weight 1
    val df = ((1 to 500).map(i => (i.toLong, 1000L)) ++
      (501 to 1000).map(i => (i.toLong, 1L))).toDF("id", "w")
    val picked = SampleSynopsis.weighted(df, "id", "w", 50)
      .select("id").as[Long].collect()
    val heavy = picked.count(_ <= 500)
    assert(heavy > 40, s"expected the heavy stratum to dominate, got $heavy/50")
  }
}
