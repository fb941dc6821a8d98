package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 64

  /** Plain-Scala replay of the counter table. */
  private def reference(values: Seq[String]): Array[Long] = {
    val buf = new Array[Long](depth * width)
    values.foreach { v =>
      val h = Sketches.hashString(v, 0x9747b28cL)
      (0 until depth).foreach { r =>
        val b = (Sketches.splitmix64(h ^ CmsSketch.rowSeed(r)) &
          (width - 1)).toInt
        buf(r * width + b) += 1L
      }
    }
    buf
  }

  private def refEstimate(buf: Array[Long], v: String): Long = {
    val h = Sketches.hashString(v, 0x9747b28cL)
    (0 until depth).map { r =>
      buf(r * width + (Sketches.splitmix64(h ^ CmsSketch.rowSeed(r)) &
        (width - 1)).toInt)
    }.min
  }

  private val corpus: Seq[String] =
    Seq.fill(300)("the") ++ Seq.fill(120)("quick") ++ Seq.fill(40)("fox") ++
      (1 to 500).map(i => s"tail$i")

  private def sketchOf(parts: Int): Array[Long] = {
    val arr = corpus.toDF("v").repartition(parts)
      .agg(CmsSketch.cms(col("v"), depth, width).as("sk"))
      .collect().head.getSeq[Long](0).toArray
    assert(arr.take(2).toSeq == Seq(depth.toLong, width.toLong),
      "emitted sketch must lead with its [depth, width] geometry header")
    arr.drop(2)
  }

  test("counter table matches the plain-Scala replay exactly, at any partitioning") {
    val expected = reference(corpus).toSeq
    Seq(1, 4, 17).foreach { parts =>
      assert(sketchOf(parts).toSeq == expected,
        s"counters diverged at $parts partitions")
    }
  }

  test("estimates never under-count and bound the heavy hitters tightly") {
    val buf = reference(corpus)
    val exact = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // CMS invariant: estimate >= true count, always
    exact.foreach { case (v, n) =>
      assert(refEstimate(buf, v) >= n, s"under-count for $v")
    }
    // heavy hitters: over-count bounded by 2N/width w.h.p.
    val n = corpus.size.toLong
    Seq("the", "quick", "fox").foreach { v =>
      val e = refEstimate(buf, v)
      assert(e - exact(v) <= 2 * n / width,
        s"$v over-counted: $e vs ${exact(v)}")
    }
  }

  test("cmsEstimate column expression equals the replay over the built sketch") {
    val sk = corpus.toDF("v").repartition(4)
      .agg(CmsSketch.cms(col("v"), depth, width).as("sk"))
      .collect().head.getSeq[Long](0)
    val items = Seq("the", "quick", "fox", "tail1", "tail499")
    val out = items.toDF("term")
      .crossJoin(Seq(Tuple1(sk)).toDF("sk"))
      .select(col("term"),
        CmsSketch.cmsEstimate(col("sk"),
          Sketches.stringHash64(col("term"), 0x9747b28cL),
          depth, width).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val buf = reference(corpus)
    items.foreach { v =>
      assert(out(v) == refEstimate(buf, v), s"column estimate diverged for $v")
    }
  }

  test("stored counter tables roll up bit-identically to the direct sketch") {
    val df = corpus.zipWithIndex
      .map { case (v, i) => (i % 5, v) }.toDF("fine", "v")
    val rolled = df.groupBy("fine")
      .agg(CmsSketch.cms(col("v"), depth, width).as("sk"))
      .agg(CmsSketch.cmsMerge(col("sk"), depth, width).as("sk"))
      .collect().head.getSeq[Long](0).toArray
    assert(rolled.take(2).toSeq == Seq(depth.toLong, width.toLong))
    assert(rolled.drop(2).toSeq == reference(corpus).toSeq,
      "merged rollup diverged from the direct counter table")
    // a blob of the wrong geometry fails loud
    intercept[Exception] {
      df.groupBy("fine").agg(CmsSketch.cms(col("v"), 2, 32).as("sk"))
        .agg(CmsSketch.cmsMerge(col("sk"), depth, width))
        .collect()
    }
    // ...including geometries that COLLIDE on total cell count: before
    // the header, a (2,512) table merged under (4,256) silently
    // misaligned rows and could UNDER-count
    intercept[Exception] {
      df.groupBy("fine").agg(CmsSketch.cms(col("v"), 2, 512).as("sk"))
        .agg(CmsSketch.cmsMerge(col("sk"), 4, 256))
        .collect()
    }
  }

  test("depth-1 sketches estimate without least() and stay exact on the invariant") {
    val got = Seq("a", "a", "b").toDF("v")
      .agg(CmsSketch.cms(col("v"), 1, 8).as("sk"))
      .select(CmsSketch.cmsEstimate(col("sk"),
        Sketches.stringHash64(lit("a"), 0x9747b28cL), 1, 8).as("e"))
      .collect().head.getLong(0)
    assert(got >= 2L, "depth-1 estimate must never under-count")
    val sqlGot = {
      Seq("a", "a", "b").toDF("s").createOrReplaceTempView("cms_d1_t")
      GraftFunctions.registerAll(spark)
      spark.sql(
        """SELECT cms_estimate(sk, string_hash64('a', 2538058380), 1, 8) AS e
          |FROM (SELECT cms_sketch(s, 1, 8) AS sk FROM cms_d1_t)""".stripMargin)
        .collect().head.getLong(0)
    }
    assert(sqlGot == got, "SQL-registered depth-1 estimate diverged")
  }

  test("grouped sketches stay independent and knobs are guarded") {
    val df = Seq(("a", "x"), ("a", "x"), ("b", "x")).toDF("g", "v")
    val got = df.groupBy("g").agg(CmsSketch.cms(col("v"), 2, 8).as("sk"))
      .select(col("g"), CmsSketch.cmsEstimate(col("sk"),
        Sketches.stringHash64(lit("x"), 0x9747b28cL), 2, 8).as("e"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L), ("b", 1L)))
    intercept[IllegalArgumentException] {
      CmsSketch(exprOf(col("v")), depth = 4, width = 100) // not a power of two
    }
    intercept[IllegalArgumentException] {
      CmsSketch(exprOf(col("v")), depth = 0, width = 64)
    }
  }
}
