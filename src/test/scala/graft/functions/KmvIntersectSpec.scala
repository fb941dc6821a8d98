package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvIntersectSpec extends SparkSpec {
  import spark.implicits._

  private val k = 64

  /** Plain-Scala replay of the Beyer et al. chain over two long sets. */
  private def reference(a: Seq[Long], b: Seq[Long]): Long = {
    def mins(xs: Seq[Long]): Seq[Long] =
      xs.distinct.map(Sketches.splitmix64)
        .sortWith(java.lang.Long.compareUnsigned(_, _) < 0).take(k)
    val (ma, mb) = (mins(a), mins(b))
    val l = (ma ++ mb).distinct
      .sortWith(java.lang.Long.compareUnsigned(_, _) < 0).take(k)
    val kboth = l.count(h => ma.contains(h) && mb.contains(h)).toLong
    if (l.size < k) kboth
    else {
      val u = (l.last >>> 11).toDouble / (1L << 53).toDouble
      math.floor(kboth.toDouble *
        ((k - 1) / math.max(u, Double.MinPositiveValue)) / k + 0.5).toLong
    }
  }

  private def estimate(a: Seq[Long], b: Seq[Long]): Long = {
    val mins = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
      .groupBy("g").agg(KmvDistinct.kmvMinima(col("v"), k).as("m"))
    mins.where(col("g") === "a").select(col("m").as("ma"))
      .crossJoin(mins.where(col("g") === "b").select(col("m").as("mb")))
      .select(KmvDistinct.kmvIntersectEstimate(col("ma"), col("mb"), k))
      .collect().head.getLong(0)
  }

  test("under-capacity synopses are COMPLETE: the intersection is exact") {
    val a = (1L to 40L)
    val b = (25L to 60L)
    assert(estimate(a, b) == 16L) // |[25,40]| exactly — both sets fit in k
  }

  test("over-capacity estimate matches the replay and tracks the truth") {
    val a = (1L to 3000L)
    val b = (2001L to 5000L) // true intersection 1000
    val got = estimate(a, b)
    assert(got == reference(a, b), "engine diverged from the replay")
    assert(math.abs(got - 1000L) <= 450L,
      s"estimate $got too far from 1000 at k=$k")
    // disjoint sets estimate 0 (no shared hash can enter both minima)
    assert(estimate(1L to 3000L, 10001L to 13000L) == 0L)
  }

  test("minima arrays built at a larger k fail loud in the estimator") {
    val mins = (1L to 500L).map(("a", _)).toDF("g", "v")
      .groupBy("g").agg(KmvDistinct.kmvMinima(col("v"), 128).as("m"))
    intercept[Exception] {
      mins.select(col("m").as("ma")).crossJoin(
        mins.select(col("m").as("mb")))
        .select(KmvDistinct.kmvIntersectEstimate(col("ma"), col("mb"), k))
        .collect()
    }
  }

  test("stored minima roll up bit-identically to the direct build; estimate matches") {
    val vals = (1L to 2000L)
    val direct = vals.toDF("v")
      .agg(KmvDistinct.kmvMinima(col("v"), k).as("m"))
      .collect().head.getSeq[Long](0)
    val rolled = vals.zipWithIndex.map { case (v, i) => (i % 7, v) }
      .toDF("fine", "v")
      .groupBy("fine").agg(KmvDistinct.kmvMinima(col("v"), k).as("m"))
      .agg(KmvDistinct.kmvMergeMinima(col("m"), k).as("m"))
      .collect().head.getSeq[Long](0)
    assert(rolled == direct, "merged rollup diverged from the direct minima")
    // the row-local estimate readout equals the aggregate estimator
    val est = Seq(Tuple1(direct)).toDF("m")
      .select(KmvDistinct.kmvEstimate(col("m"), k)).collect().head.getLong(0)
    val agg = vals.toDF("v")
      .agg(KmvDistinct.kmvDistinct(col("v"), k)).collect().head.getLong(0)
    assert(est == agg, "kmv_estimate readout diverged from kmv_distinct")
    // under capacity both are exact
    val small = (1L to 50L).toDF("v")
      .agg(KmvDistinct.kmvMinima(col("v"), k).as("m"))
      .select(KmvDistinct.kmvEstimate(col("m"), k)).collect().head.getLong(0)
    assert(small == 50L)
  }

  test("kmv_minima/kmv_intersect are SQL-addressable and match the Column API") {
    (1L to 300L).toDF("v").createOrReplaceTempView("kmv_sql_a")
    (151L to 450L).toDF("v").createOrReplaceTempView("kmv_sql_b")
    GraftFunctions.registerAll(spark)
    val sql = spark.sql(
      s"""SELECT kmv_intersect(
         |  (SELECT kmv_minima(v, $k) FROM kmv_sql_a),
         |  (SELECT kmv_minima(v, $k) FROM kmv_sql_b), $k) AS e""".stripMargin)
      .collect().head.getLong(0)
    assert(sql == estimate(1L to 300L, 151L to 450L))
  }
}
