package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val quotes = Seq( // (key, time, px)
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 10.0)
  ).toDF("k", "t", "px")

  private val trades = Seq( // (key, time, qty)
    ("A", 5L, 100L),  // before any quote → null
    ("A", 20L, 200L), // equal time → inclusive match (2.0)
    ("A", 25L, 300L), // between quotes → 2.0
    ("A", 99L, 400L), // after all → 3.0
    ("B", 15L, 500L), // exact → 10.0
    ("C", 50L, 600L)  // key with no quotes at all → null
  ).toDF("k", "t", "qty")

  test("backward as-of join picks the latest quote at or before each trade") {
    val out = AsOfJoin.asofBackward(trades, quotes, "k", "t", Seq("px"))
      .orderBy("k", "t")
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("t"),
        Option(r.getAs[java.lang.Double]("px")).map(_.doubleValue)))
    assert(out.toSeq == Seq(
      ("A", 5L, None), ("A", 20L, Some(2.0)), ("A", 25L, Some(2.0)),
      ("A", 99L, Some(3.0)), ("B", 15L, Some(10.0)), ("C", 50L, None)))
  }

  test("right-side ties resolve to the max value tuple, deterministically") {
    val dupQuotes = quotes.unionByName(Seq(("A", 20L, 7.0)).toDF("k", "t", "px"))
    val out = AsOfJoin.asofBackward(trades, dupQuotes, "k", "t", Seq("px"))
      .where(col("t") === 25L).collect()
    assert(out.length == 1 && out(0).getAs[Double]("px") == 7.0)
  }

  test("left columns pass through untouched; plan shuffles exactly once") {
    val joined = AsOfJoin.asofBackward(trades, quotes, "k", "t", Seq("px"))
    assert(joined.columns.toSeq == Seq("k", "t", "qty", "px"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"expected a single key-partitioned Exchange, got:\n$plan")
  }

  test("agrees with the naive max_by formulation on randomized data") {
    val rnd = new scala.util.Random(20260812L)
    val l = Seq.tabulate(400)(i =>
      (s"k${rnd.nextInt(8)}", rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "pid")
    val r = Seq.tabulate(300)(i =>
      (s"k${rnd.nextInt(10)}", rnd.nextInt(1000).toLong, i.toDouble))
      .toDF("k", "t", "px")
    val got = AsOfJoin.asofBackward(l, r, "k", "t", Seq("px"))
      .select("pid", "px").as[(Long, Option[Double])].collect().sortBy(_._1).toSeq
    // naive: join all earlier-or-equal quotes, take max (time, px) struct —
    // the same latest-time / max-tuple-on-tie rule
    val naive = l.join(
        r.select(col("k"), col("t").as("rt"), col("px")),
        Seq("k"), "left")
      .where(col("rt").isNull || col("rt") <= col("t"))
      .groupBy(col("pid"))
      .agg(max(struct(col("rt"), col("px"))).as("m"))
    val want = l.select("pid").join(naive, Seq("pid"), "left")
      .select(col("pid"), col("m.px").as("px"))
      .as[(Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(got == want)
  }

  test("forward as-of join picks the earliest quote at or after each trade") {
    val out = AsOfJoin.asofForward(trades, quotes, "k", "t", Seq("px"))
      .orderBy("k", "t")
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("t"),
        Option(r.getAs[java.lang.Double]("px")).map(_.doubleValue)))
    assert(out.toSeq == Seq(
      ("A", 5L, Some(1.0)),  // next quote at 10
      ("A", 20L, Some(2.0)), // equal time → inclusive
      ("A", 25L, Some(3.0)), // next quote at 30
      ("A", 99L, None),      // after all quotes
      ("B", 15L, Some(10.0)), ("C", 50L, None)))
  }

  test("nearest as-of join picks the closer quote, ties backward") {
    // A-quotes at 10, 20, 30: trade at 14 → 10 is 4 away, 20 is 6 → 1.0;
    // trade at 25 → equidistant (20, 30) → backward tie → 2.0
    val probes = Seq(("A", 14L, 1L), ("A", 25L, 2L), ("A", 5L, 3L),
      ("A", 99L, 4L), ("C", 1L, 5L)).toDF("k", "t", "qty")
    val out = AsOfJoin.asofNearest(probes, quotes, "k", "t", Seq("px"))
      .orderBy("qty").collect()
      .map(r => Option(r.getAs[java.lang.Double]("px")).map(_.doubleValue))
    assert(out.toSeq == Seq(Some(1.0), Some(2.0), Some(1.0), Some(3.0), None))
  }

  test("forward/nearest agree with naive formulations on randomized data") {
    val rnd = new scala.util.Random(20260813L)
    val l = Seq.tabulate(400)(i =>
      (s"k${rnd.nextInt(8)}", rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "pid")
    val r = Seq.tabulate(300)(i =>
      (s"k${rnd.nextInt(10)}", rnd.nextInt(1000).toLong, i.toDouble))
      .toDF("k", "t", "px")
    val rr = r.select(col("k"), col("t").as("rt"), col("px"))
    def naive(pred: org.apache.spark.sql.Column, pick: org.apache.spark.sql.Column) =
      l.select("pid").join(
        l.join(rr, Seq("k"), "left").where(col("rt").isNull || pred)
          .groupBy(col("pid")).agg(pick.as("m")),
        Seq("pid"), "left")
        .select(col("pid"), col("m.px").as("px"))
        .as[(Long, Option[Double])].collect().sortBy(_._1).toSeq
    // forward: min (rt, px)? no — earliest time, max tuple on tie ⇒
    // max(struct(-rt, px)) trick: negate time so max picks min time
    val wantF = naive(col("rt") >= col("t"),
      max(struct((-col("rt")).as("nrt"), col("px"))))
    val gotF = AsOfJoin.asofForward(l, r, "k", "t", Seq("px"))
      .select("pid", "px").as[(Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(gotF == wantF)
    // nearest: min (|rt−t|, backward-loses-nothing) — replicate the rule:
    // closest distance; tie → backward; inside a side, max px
    val dist = abs(col("rt") - col("t"))
    val backBonus = when(col("rt") <= col("t"), lit(1)).otherwise(lit(0))
    val wantN = naive(lit(true),
      max(struct((-dist).as("nd"), backBonus.as("bb"), col("px"))))
    val gotN = AsOfJoin.asofNearest(l, r, "k", "t", Seq("px"))
      .select("pid", "px").as[(Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(gotN == wantN)
  }

  test("tolerance nulls out matches farther than the bound, inclusively") {
    import org.apache.spark.sql.functions.lit
    def pxs(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k", "t").collect()
        .map(r => Option(r.getAs[java.lang.Double]("px")).map(_.doubleValue)).toSeq
    // trades: A@5 (next quote 10, dist 5), A@25 (prev 20 d5 / next 30 d5),
    // A@99 (prev 30, dist 69)
    val b = AsOfJoin.asofBackward(trades, quotes, "k", "t", Seq("px"),
      tolerance = Some(lit(5L)))
    assert(pxs(b) == Seq(None, Some(2.0), Some(2.0), None, Some(10.0), None))
    val f = AsOfJoin.asofForward(trades, quotes, "k", "t", Seq("px"),
      tolerance = Some(lit(5L)))
    assert(pxs(f) == Seq(Some(1.0), Some(2.0), Some(3.0), None, Some(10.0), None))
    val nr = AsOfJoin.asofNearest(trades, quotes, "k", "t", Seq("px"),
      tolerance = Some(lit(4L)))
    // A@25 nearest is 20 at distance 5 > 4 → null; exact matches survive
    assert(pxs(nr) == Seq(None, Some(2.0), None, None, Some(10.0), None))
  }

  test("nearest shuffles exactly once (two sorts share one Exchange)") {
    val joined = AsOfJoin.asofNearest(trades, quotes, "k", "t", Seq("px"))
    assert(joined.columns.toSeq == Seq("k", "t", "qty", "px"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"expected a single key-partitioned Exchange, got:\n$plan")
  }

  test("multiple right value columns travel together") {
    val q2 = quotes.withColumn("src", concat(col("k"), lit("-"), col("t")))
    val out = AsOfJoin.asofBackward(trades, q2, "k", "t", Seq("px", "src"))
      .where(col("t") === 99L).collect()(0)
    assert(out.getAs[Double]("px") == 3.0 && out.getAs[String]("src") == "A-30")
  }
}
