package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class KvAggPushdownSpec extends SparkSpec {
  import spark.implicits._

  private def stage(): String = {
    val dir = Files.createTempDirectory("kvagg").toString
    Seq((1L, 10.0, "cherry"), (2L, 5.5, "apple"), (3L, 20.25, "banana"))
      .toDF("id", "price", "name")
      .repartition(2) // multiple files → stats fold across files
      .write.format("kv").option("path", dir).mode("overwrite").save()
    dir
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("ungrouped COUNT/MIN/MAX are answered from footers only") {
    val dir = stage()
    val df = spark.read.format("kv").option("path", dir).load()
      .agg(count(lit(1)).as("n"), count(col("name")).as("n_names"),
        min(col("id")).as("min_id"), max(col("price")).as("max_price"),
        min(col("name")).as("min_name"), max(col("name")).as("max_name"))
    assert(planOf(df).contains("PushedAggregation"), planOf(df))
    val r = df.collect()(0)
    assert(r.getAs[Long]("n") == 3 && r.getAs[Long]("n_names") == 3)
    assert(r.getAs[Long]("min_id") == 1L)
    assert(r.getAs[Double]("max_price") == 20.25)
    assert(r.getAs[String]("min_name") == "apple")
    assert(r.getAs[String]("max_name") == "cherry")
  }

  test("any filter or grouping falls back to a real scan — and stays right") {
    val dir = stage()
    val filtered = spark.read.format("kv").option("path", dir).load()
      .where(col("id") > 1).agg(count(lit(1)).as("n"), min(col("price")).as("mn"))
    assert(!planOf(filtered).contains("PushedAggregation"))
    val fr = filtered.collect()(0)
    assert(fr.getAs[Long]("n") == 2 && fr.getAs[Double]("mn") == 5.5)

    val grouped = spark.read.format("kv").option("path", dir).load()
      .groupBy(col("name")).agg(count(lit(1)).as("n"))
    assert(!planOf(grouped).contains("PushedAggregation"))
    assert(grouped.count() == 3)
  }

  test("unsupported aggregate or column type falls back") {
    val dir = stage()
    // avg is not a footer statistic; count distinct is not either
    val df = spark.read.format("kv").option("path", dir).load()
      .agg(avg(col("price")).as("a"), countDistinct(col("name")).as("d"))
    assert(!planOf(df).contains("PushedAggregation"))
    val r = df.collect()(0)
    assert(math.abs(r.getAs[Double]("a") - 35.75 / 3) < 1e-9 && r.getAs[Long]("d") == 3)
  }

  test("sparse columns: files missing the column count as all-null") {
    val dir = Files.createTempDirectory("kvaggsparse").toString
    Seq((1L, "x")).toDF("id", "extra")
      .write.format("kv").option("path", dir).mode("overwrite").save()
    Seq(Tuple1(2L)).toDF("id")
      .write.format("kv").option("path", dir).mode("append").save()
    val df = spark.read.format("kv").option("path", dir).load()
      .agg(count(lit(1)).as("n"), count(col("extra")).as("n_extra"),
        min(col("extra")).as("mn"))
    val r = df.collect()(0)
    assert(r.getAs[Long]("n") == 2)
    assert(r.getAs[Long]("n_extra") == 1, "missing column counts as null")
    assert(r.getAs[String]("mn") == "x")
  }
}
