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
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1,
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

  test("multiple right value columns travel together") {
    val q2 = quotes.withColumn("src", concat(col("k"), lit("-"), col("t")))
    val out = AsOfJoin.asofBackward(trades, q2, "k", "t", Seq("px", "src"))
      .where(col("t") === 99L).collect()(0)
    assert(out.getAs[Double]("px") == 3.0 && out.getAs[String]("src") == "A-30")
  }
}
