package graft
import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q6_revenue_forecast", "q5_region_revenue", "q3_shipping_priority", "q_kv_scan")) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      println(s"=== $q ===")
      println("  pushed: " + plan.linesIterator.filter(_.contains("PushedFilters")).map(_.trim.take(150)).mkString(" | "))
      println("  broadcast joins: " + plan.linesIterator.count(_.contains("BroadcastHashJoin")))
      println("  sortmerge joins: " + plan.linesIterator.count(_.contains("SortMergeJoin")))
      println("  wholestage spans: " + plan.linesIterator.count(_.contains("WholeStageCodegen")))
    }
    spark.stop()
  }
}
