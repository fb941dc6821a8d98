package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import graft.sources.kv.KvIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FilterExec

/** Search-index scan mode (reference `TableStoreRelation.scala:364-438`,
  * `SearchIndexSuite.scala:69-108`): with an index built, eligible
  * filters are satisfied by the source — Spark plans NO re-filter — and
  * only true residuals are negotiated back; zone maps prune row groups at
  * planning time.
  */
class KvIndexSpec extends SparkSpec {
  import spark.implicits._

  /** 4 files × sorted key ranges, small row groups for pruning tests. */
  private def makeTable(): String = {
    val dir = Files.createTempDirectory("kvidx").toString + "/t"
    (0 until 4).foreach { part =>
      val rows = (part * 1000 until (part + 1) * 1000)
        .map(i => (i.toLong, s"cat${i % 5}", i * 1.5))
      rows.toDF("k", "cat", "v").coalesce(1)
        .write.format("kv").option("path", dir).mode("append").save()
    }
    dir
  }

  private def filtersOf(df: org.apache.spark.sql.DataFrame): Seq[FilterExec] =
    df.queryExecution.executedPlan.collect { case f: FilterExec => f }

  test("index satisfies eligible filters: no post-scan Filter; residuals only for the rest") {
    val dir = makeTable()
    def q(d: String) = spark.read.format("kv").option("path", d).load()
      .filter(col("k") === 1500L)

    // without an index every filter is residual → a Filter node exists
    assert(filtersOf(q(dir)).nonEmpty, "unindexed scan must re-apply filters")
    val expected = q(dir).collect().toSeq

    KvIndex.build(dir, Seq("k", "cat"))
    val indexed = q(dir)
    assert(filtersOf(indexed).isEmpty,
      s"indexed equality must be satisfied by the source: ${indexed.queryExecution.executedPlan}")
    assert(indexed.collect().toSeq == expected, "same rows with and without the index")

    // a filter on a non-indexed column stays residual
    val mixed = spark.read.format("kv").option("path", dir).load()
      .filter(col("k") === 1500L && col("v") > 0.0)
    val residuals = filtersOf(mixed)
    assert(residuals.nonEmpty)
    val cond = residuals.map(_.condition.sql).mkString(" ")
    assert(cond.contains("v"), s"non-indexed v predicate must be re-applied: $cond")
    assert(!cond.contains("(k = 1500"), s"indexed k predicate must not be re-applied: $cond")
    assert(mixed.collect().map(_.getLong(0)).toSeq == Seq(1500L))
  }

  test("zone map prunes row groups at planning time") {
    val dir = makeTable()
    KvIndex.build(dir, Seq("k", "cat"))
    val all = spark.read.format("kv").option("path", dir).load()
    val allParts = all.rdd.getNumPartitions
    // keys 0..999 live in one file — the other files' groups are pruned
    val pruned = spark.read.format("kv").option("path", dir).load()
      .filter(col("k") < 1000L)
    assert(pruned.rdd.getNumPartitions < allParts,
      s"selective range must plan fewer splits (${pruned.rdd.getNumPartitions} vs $allParts)")
    assert(pruned.count() == 1000L)
  }

  test("range, IN, and IS NOT NULL on indexed columns are satisfied") {
    val dir = makeTable()
    KvIndex.build(dir, Seq("k", "cat"))
    val range = spark.read.format("kv").option("path", dir).load()
      .filter(col("k") >= 100L && col("k") < 200L)
    assert(filtersOf(range).isEmpty, "indexed range must be satisfied")
    assert(range.count() == 100L)
    val in = spark.read.format("kv").option("path", dir).load()
      .filter(col("cat").isin("cat1", "cat3"))
    assert(filtersOf(in).isEmpty, "indexed IN must be satisfied")
    assert(in.count() == 1600L)
  }

  test("index stays safe when new files arrive after the build (stale map)") {
    val dir = makeTable()
    KvIndex.build(dir, Seq("k", "cat"))
    // append a file the index has never seen
    Seq((9999L, "cat0", 1.0)).toDF("k", "cat", "v").coalesce(1)
      .write.format("kv").option("path", dir).mode("append").save()
    val got = spark.read.format("kv").option("path", dir).load()
      .filter(col("k") === 9999L).collect()
    assert(got.length == 1, "uncovered files are never pruned and still filtered correctly")
  }
}
