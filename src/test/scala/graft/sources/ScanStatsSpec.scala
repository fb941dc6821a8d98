package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** DSv2 statistics reporting (kv + log scans): without
  * `SupportsReportStatistics` a DSv2 relation reports
  * `defaultSizeInBytes` (effectively infinite), so small dimension
  * tables can never sit on the broadcast side of a join — at cluster
  * scale every star join would shuffle the fact table against a 25-row
  * dim. These pin the footer-derived estimates and the planner outcome.
  */
class ScanStatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def kv(table: String) =
    spark.read.format("kv").option("path", s"$dir/$table.parquet").load()

  test("kv scan reports footer-derived statistics") {
    val rel = kv("nation").queryExecution.optimizedPlan
    val stats = rel.stats
    assert(stats.sizeInBytes > 0 && stats.sizeInBytes < (1L << 20),
      s"expected a small finite size for nation, got ${stats.sizeInBytes}")
    assert(stats.rowCount.exists(rc => rc > 0 && rc < 100),
      s"expected nation rowCount < 100, got ${stats.rowCount}")
  }

  test("column pruning shrinks the kv size estimate") {
    val all = kv("customer").queryExecution.optimizedPlan.stats.sizeInBytes
    val pruned = kv("customer").select("c_custkey")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(pruned < all, s"pruned $pruned should be < full $all")
  }

  test("log scan reports offset-prorated statistics") {
    val all = spark.read.format("log")
      .option("path", s"$dir/lineitem.parquet")
      .load().queryExecution.optimizedPlan.stats.sizeInBytes
    assert(all > 0 && all < (1L << 32), s"expected finite log size, got $all")
  }

  test("small kv dimension auto-broadcasts in a fact join") {
    val fact = spark.read.format("log").option("path", s"$dir/lineitem.parquet").load()
    val dim = kv("supplier")
    val joined = fact.join(dim, fact("l_suppkey") === dim("s_suppkey"))
      .groupBy("s_name").count()
    joined.collect()
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val hasBroadcast = plan.toString.contains("BroadcastHashJoin")
    assert(hasBroadcast, s"expected BroadcastHashJoin, plan:\n$plan")
  }
}
