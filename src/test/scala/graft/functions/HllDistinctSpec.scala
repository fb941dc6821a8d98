package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllDistinctSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala replay of the register chain + estimator — the
    * independent reference the DuckDB oracle also follows.
    */
  private def reference(values: Seq[Long], p: Int): Long = {
    val m = 1 << p
    val cap = 64 - p + 1
    val regs = new Array[Int](m)
    values.foreach { v =>
      val h = Sketches.splitmix64(v)
      val b = (h >>> (64 - p)).toInt
      val rho = math.min(cap, java.lang.Long.numberOfLeadingZeros(h << p) + 1)
      if (rho > regs(b)) regs(b) = rho
    }
    var s = BigInt(0); var zeros = 0
    regs.foreach { mj => if (mj == 0) zeros += 1; s += BigInt(1) << (cap - mj) }
    val md = m.toDouble
    val eRaw = 0.7213 / (1.0 + 1.079 / md) * md * md *
      math.pow(2.0, cap.toDouble) / s.doubleValue
    math.round(
      if (eRaw <= 2.5 * md && zeros > 0) md * math.log(md / zeros.toDouble)
      else eRaw)
  }

  private def hll(values: Seq[Long], p: Int, parts: Int): Long =
    values.toDF("v").repartition(parts)
      .agg(HllDistinct.hllDistinct(col("v"), p).as("ndv"))
      .collect().head.getLong(0)

  test("estimate matches the plain-Scala register replay bit for bit") {
    val rnd = new scala.util.Random(7)
    val small = Seq.fill(500)(rnd.nextLong() % 40)        // dense dups
    val large = Seq.fill(4000)(rnd.nextLong())            // ~all distinct
    for (vals <- Seq(small, large); p <- Seq(8, 12)) {
      assert(hll(vals, p, 5) == reference(vals, p),
        s"aggregate diverged from the reference at p=$p")
    }
  }

  test("partition layout cannot change the answer (merge = register max)") {
    val vals = (1L to 3000L).map(i => i % 700)
    val answers = Seq(1, 3, 13, 32).map(hll(vals, 10, _)).distinct
    assert(answers.size == 1, s"partitioning changed the estimate: $answers")
  }

  test("accuracy: within ~3 sigma of 1.04/sqrt(m) at p=12, near-exact in the linear-counting range") {
    val n = 5000
    val est = hll((1L to n.toLong).map(Sketches.splitmix64), 12, 8)
    val sigma = 1.04 / math.sqrt(1 << 12)
    assert(math.abs(est - n).toDouble / n < 3 * sigma,
      s"estimate $est vs exact $n out of tolerance")
    // 20 distinct at p=8 takes the m*ln(m/V) branch: tight at low card
    val small = hll((1L to 20L), 8, 4)
    assert(math.abs(small - 20L) <= 1, s"linear-counting estimate $small")
  }

  test("stored registers roll up bit-identically to the direct sketch") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 2000).map(_ => (rnd.nextInt(6), rnd.nextLong() % 500))
    val df = rows.toDF("fine", "v")
    // fine-grained sketch rows, then a rollup from the blobs alone
    val rolled = df.groupBy("fine")
      .agg(HllDistinct.hllRegisters(col("v"), 9).as("regs"))
      .agg(HllMerge.hllMergeEstimate(col("regs"), 9).as("ndv"))
      .collect().head.getLong(0)
    val direct = df.agg(HllDistinct.hllDistinct(col("v"), 9).as("ndv"))
      .collect().head.getLong(0)
    assert(rolled == direct,
      s"merged rollup $rolled != direct sketch $direct")
    // a blob of the wrong precision fails loud, never silently mixes
    val err = intercept[Exception] {
      df.groupBy("fine").agg(HllDistinct.hllRegisters(col("v"), 8).as("regs"))
        .agg(HllMerge.hllMergeEstimate(col("regs"), 9))
        .collect()
    }
    assert(err.getMessage != null)
  }

  test("the sketch aggregates are SQL-addressable and match the Column API") {
    GraftFunctions.registerAll(spark)
    val rnd = new scala.util.Random(3)
    Seq.fill(800)(rnd.nextLong() % 300).toDF("v")
      .createOrReplaceTempView("hll_sql_t")
    val sql = spark.sql(
      "SELECT hll_distinct(v, 9) AS h, kmv_distinct(v, 64) AS k FROM hll_sql_t")
      .collect().head
    val api = spark.table("hll_sql_t")
      .agg(HllDistinct.hllDistinct(col("v"), 9).as("h"),
        KmvDistinct.kmvDistinct(col("v"), 64).as("k"))
      .collect().head
    assert(sql.getLong(0) == api.getLong(0) && sql.getLong(1) == api.getLong(1))
    // registers → merge round-trip and the CMS family through SQL
    val merged = spark.sql(
      """SELECT hll_merge(r, 9) AS h FROM (
        |  SELECT v % 4 AS g, hll_registers(v, 9) AS r
        |  FROM hll_sql_t GROUP BY v % 4)""".stripMargin)
      .collect().head.getLong(0)
    assert(merged == api.getLong(0), "SQL hll_merge diverged from direct")
    Seq("a", "a", "b").toDF("s").createOrReplaceTempView("cms_sql_t")
    val est = spark.sql(
      """SELECT cms_estimate(sk, string_hash64('a', 2538058380), 2, 8) AS e
        |FROM (SELECT cms_sketch(s, 2, 8) AS sk FROM cms_sql_t)""".stripMargin)
      .collect().head.getLong(0)
    assert(est == 2L, s"SQL cms estimate $est != 2")
  }

  test("hll_union/hll_estimate: overlap by inclusion-exclusion from stored blobs") {
    val p = 8
    // two corpora sharing exactly 300 of 500/400 members
    val a = (1L to 500L)
    val b = (201L to 600L)
    val regs = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
      .groupBy("g").agg(HllDistinct.hllRegisters(col("v"), p).as("regs"))
    val row = regs.where(col("g") === "a").select(col("regs").as("ra"))
      .crossJoin(regs.where(col("g") === "b").select(col("regs").as("rb")))
      .select(
        HllMerge.hllEstimate(col("ra"), p).as("ea"),
        HllMerge.hllEstimate(col("rb"), p).as("eb"),
        HllMerge.hllEstimate(HllMerge.hllUnion(col("ra"), col("rb")), p)
          .as("eu"))
      .collect().head
    // the union expression must equal the direct sketch of a ++ b
    assert(row.getLong(2) == reference((a ++ b).distinct, p),
      "hll_union register max diverged from the direct union sketch")
    // row-local estimate readout equals the aggregate path
    assert(row.getLong(0) == reference(a, p))
    // inclusion-exclusion lands near the true 300 at p=8 (~6.5% rse
    // per estimate, differenced)
    val overlap = row.getLong(0) + row.getLong(1) - row.getLong(2)
    assert(math.abs(overlap - 300L) <= 120L,
      s"overlap estimate $overlap too far from 300")
    // mismatched precisions fail loud
    val r7 = (1L to 50L).map(("c", _)).toDF("g", "v")
      .groupBy("g").agg(HllDistinct.hllRegisters(col("v"), 7).as("regs"))
      .select(col("regs").as("rc"))
    intercept[Exception] {
      regs.where(col("g") === "a").select(col("regs").as("ra"))
        .crossJoin(r7)
        .select(HllMerge.hllUnion(col("ra"), col("rc"))).collect()
    }
  }

  test("grouped aggregation and string inputs") {
    val df = Seq(("a", "x1"), ("a", "x2"), ("a", "x1"), ("b", "y1"))
      .toDF("g", "v")
    val out = df.groupBy("g")
      .agg(HllDistinct.hllDistinct(col("v"), 8).as("ndv"))
      .orderBy("g").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 2L), ("b", 1L)))
  }
}
