package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq( // (key, p, pid)
    ("u1", 100L, 1L), ("u1", 150L, 2L), ("u1", 200L, 3L), ("u1", 999L, 4L),
    ("u2", 150L, 5L)
  ).toDF("k", "p", "pid")

  private val intervals = Seq( // (key, lo, hi, iid)
    ("u1", 100L, 200L, 10L),  // hits 1,2,3 (inclusive both ends)
    ("u1", 201L, 300L, 11L),  // hits none
    ("u2", 0L, 5000L, 12L)    // wide interval spanning many buckets → 5
  ).toDF("k", "lo", "hi", "iid")

  test("pointInInterval matches the raw BETWEEN predicate, ends inclusive") {
    val got = IntervalJoin.pointInInterval(points, intervals, "p", "lo", "hi",
      bucketWidth = 50, keyCols = Seq("k"))
      .select("iid", "pid").as[(Long, Long)].collect().sorted.toSeq
    val want = points.as("a").join(intervals.as("b"),
      col("a.k") === col("b.k") && col("a.p").between(col("lo"), col("hi")))
      .select(col("iid"), col("pid")).as[(Long, Long)].collect().sorted.toSeq
    assert(got == want)
    assert(got == Seq((10L, 1L), (10L, 2L), (10L, 3L), (12L, 5L)))
  }

  test("a pair is emitted exactly once even when the interval spans many buckets") {
    val got = IntervalJoin.pointInInterval(points, intervals, "p", "lo", "hi",
      bucketWidth = 10, keyCols = Seq("k")) // u2 interval covers 501 buckets
      .where(col("iid") === 12).collect()
    assert(got.length == 1)
  }

  test("works without equi-keys (pure range join)") {
    val l = Seq((7L, 1L), (42L, 2L)).toDF("p", "pid")
    val r = Seq((0L, 10L, 100L), (40L, 45L, 200L)).toDF("lo", "hi", "iid")
    val got = IntervalJoin.pointInInterval(l, r, "p", "lo", "hi", bucketWidth = 8)
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 100L), (2L, 200L)))
  }

  test("agrees with the raw predicate on randomized data, any bucket width") {
    val rnd = new scala.util.Random(20260813L)
    val pts = Seq.tabulate(500)(i =>
      (s"k${rnd.nextInt(6)}", rnd.nextInt(10000).toLong, i.toLong)).toDF("k", "p", "pid")
    val ivs = Seq.tabulate(200) { i =>
      val lo = rnd.nextInt(10000).toLong
      (s"k${rnd.nextInt(8)}", lo, lo + rnd.nextInt(500), i.toLong)
    }.toDF("k", "lo", "hi", "iid")
    val want = pts.as("a").join(ivs.as("b"),
      col("a.k") === col("b.k") && col("a.p").between(col("lo"), col("hi")))
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    for (width <- Seq(1L, 37L, 500L, 100000L)) {
      val got = IntervalJoin.pointInInterval(pts, ivs, "p", "lo", "hi",
        bucketWidth = width, keyCols = Seq("k"))
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"bucketWidth=$width")
    }
  }

  test("plan is an equi-join, not a nested loop") {
    val plan = IntervalJoin.pointInInterval(points, intervals, "p", "lo", "hi",
      bucketWidth = 50, keyCols = Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
  }
}
