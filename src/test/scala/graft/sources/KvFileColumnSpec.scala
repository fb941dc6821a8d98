package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `_file` metadata column on kv reads — per-row file provenance (the
  * lakehouse `input_file_name`): resolved per chunk in the reader, only
  * materialized when referenced, never part of star expansion.
  */
class KvFileColumnSpec extends SparkSpec {
  import spark.implicits._

  private def stage(): String = {
    val dir = java.nio.file.Files.createTempDirectory("kvfile").toString + "/t"
    (0 until 3).foreach { i =>
      (0L until 50L).map(k => (i * 100L + k, s"v$i-$k")).toDF("k", "v")
        .coalesce(1)
        .write.format("kv").option("path", dir).mode("append").save()
    }
    dir
  }

  test("every row is attributed to the real file that holds it") {
    val dir = stage()
    // ground truth: read each physical file individually
    val expected = ParquetIO.listFiles(dir).flatMap { f =>
      spark.read.format("kv").option("path", f.toString).load()
        .select("k").as[Long].collect().map(_ -> f.toString)
    }.toMap
    assert(expected.size == 150)

    val got = spark.read.format("kv").option("path", dir).load()
      .select(col("k"), col("_file"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expected, "per-row file attribution diverged")

    // star expansion excludes the metadata column
    assert(spark.read.format("kv").option("path", dir).load()
      .columns.toSeq == Seq("k", "v"))
  }

  test("_file composes with pushdown, pruning, and multi-file partitions") {
    val dir = stage()
    // filter pushes while _file is selected; values stay correct
    val filtered = spark.read.format("kv").option("path", dir).load()
      .filter(col("k") >= 200L)
      .select(col("k"), col("_file"))
      .collect()
    assert(filtered.length == 50)
    assert(filtered.map(_.getString(1)).distinct.length == 1,
      "k >= 200 lives in exactly one staged file")
    // plan shows the filter still pushed
    val plan = spark.read.format("kv").option("path", dir).load()
      .filter(col("k") >= 200L).select(col("k"), col("_file"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual"))

    // result parity with the path that never references _file
    val withF = spark.read.format("kv").option("path", dir).load()
      .select(col("k"), col("v"), col("_file")).drop("_file")
      .orderBy("k").collect().map(_.toString).toSeq
    val without = spark.read.format("kv").option("path", dir).load()
      .orderBy("k").collect().map(_.toString).toSeq
    assert(withF == without)

    // groupBy(_file) counts reconstruct the physical layout
    val counts = spark.read.format("kv").option("path", dir).load()
      .groupBy(col("_file")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.toSeq.sorted == Seq(50L, 50L, 50L))
    assert(counts.keySet == ParquetIO.listFiles(dir).map(_.toString).toSet)
  }
}
