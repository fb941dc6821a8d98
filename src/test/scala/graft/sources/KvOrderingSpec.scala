package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import graft.operators.KvMerge
import graft.sources.kv.KvClustering
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reported sort order from clustered kv tables: after
  * `KvMerge.rewrite(clusterBy)` the scan claims its per-partition
  * ordering (`SupportsReportOrdering`) and Spark elides redundant
  * per-partition sorts; any file-set change silently withdraws the
  * claim (exact-signature validation, no invalidation hooks).
  */
class KvOrderingSpec extends SparkSpec {
  import spark.implicits._

  private def hasSort(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Sort [")

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("kvord").toString
    (0 until 1000).map(i => ((i * 37) % 1000L, s"v$i")).toDF("k", "name")
      .repartition(8)
      .write.format("kv").option("path", dir).mode("overwrite").save()
    dir
  }

  test("clustered rewrite lets the scan report ordering; sorts are elided") {
    val dir = freshTable()
    def sorted() = spark.read.format("kv").option("path", dir).load()
      .sortWithinPartitions("k")
    assert(hasSort(sorted()), "unclustered table needs a real sort")
    KvMerge.rewrite(spark, dir, numFiles = 2, clusterBy = Seq("k"))
    assert(!hasSort(sorted()), "clustered table's reported ordering must elide the sort")
    // values are complete and per-partition sorted either way
    val got = sorted().select("k").as[Long].collect()
    assert(got.sorted.toSeq == (0L until 1000L).sorted)
  }

  test("any append withdraws the ordering claim") {
    val dir = freshTable()
    KvMerge.rewrite(spark, dir, numFiles = 2, clusterBy = Seq("k"))
    assert(KvClustering.orderingFor(dir) == Seq("k"))
    Seq((5000L, "late")).toDF("k", "name")
      .write.format("kv").option("path", dir).mode("append").save()
    assert(KvClustering.orderingFor(dir).isEmpty,
      "stale clustering meta must not survive an append")
    val df = spark.read.format("kv").option("path", dir).load()
      .sortWithinPartitions("k")
    assert(hasSort(df))
  }

  test("unclustered rewrite clears previous clustering meta") {
    val dir = freshTable()
    KvMerge.rewrite(spark, dir, numFiles = 2, clusterBy = Seq("k"))
    assert(KvClustering.orderingFor(dir).nonEmpty)
    KvMerge.rewrite(spark, dir, numFiles = 2)
    assert(KvClustering.orderingFor(dir).isEmpty)
  }
}
