package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Negative paths for source option validation — the reference validates
  * offsets/options aggressively (`LoghubSourceProvider.scala:210-242`);
  * same discipline: bad input fails fast with a pointed message, never
  * silently returns wrong data.
  */
class OptionValidationSpec extends SparkSpec {
  import spark.implicits._

  private def writeShard(dir: String, name: String, n: Int): Unit = {
    val tmp = Files.createTempDirectory("t").toString
    (0 until n).map(i => (i.toLong, s"m$i")).toDF("id", "body")
      .coalesce(1).write.format("kv").option("path", tmp).mode("overwrite").save()
    val p = ParquetIO.listFiles(tmp).head
    val fs = p.getFileSystem(ParquetIO.hadoopConf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    fs.rename(p, new org.apache.hadoop.fs.Path(dir, name))
  }

  test("log: starting offset beyond ending offset fails fast") {
    val dir = Files.createTempDirectory("val1").toString
    writeShard(dir, "a.parquet", 10)
    val err = intercept[Exception] {
      spark.read.format("log").option("path", dir)
        .option("starting.offsets", "latest")
        .option("ending.offsets", """{"a.parquet": 2}""").load().count()
    }
    assert(err.getMessage.contains("starting offset"), err.getMessage)
  }

  test("log: unknown shard in offsets json fails fast") {
    val dir = Files.createTempDirectory("val2").toString
    writeShard(dir, "a.parquet", 5)
    val err = intercept[Exception] {
      spark.read.format("log").option("path", dir)
        .option("starting.offsets", """{"nope.parquet": 1}""").load().count()
    }
    assert(err.getMessage.contains("unknown shard"), err.getMessage)
  }

  test("malformed catalog JSON fails with a pointed message") {
    val err1 = intercept[Exception] {
      spark.read.format("kv")
        .option("path", "/root/testdata/sf0.001/lineitem.parquet")
        .option("catalog", """{"cols": {}}""").load()
    }
    assert(err1.getMessage.contains("columns"), err1.getMessage)
    val err2 = intercept[Exception] {
      spark.read.format("kv")
        .option("path", "/root/testdata/sf0.001/lineitem.parquet")
        .option("catalog", """{"columns": {"a": {}}}""").load()
    }
    assert(err2.getMessage.contains("missing 'type'"), err2.getMessage)
  }

  test("kv: missing path option fails fast") {
    val err = intercept[Exception] {
      spark.read.format("kv").load()
    }
    assert(err.getMessage.toLowerCase.contains("path"), err.getMessage)
  }

  test("log: malformed offsets json fails fast") {
    val dir = Files.createTempDirectory("val3").toString
    writeShard(dir, "a.parquet", 5)
    val err = intercept[Exception] {
      spark.read.format("log").option("path", dir)
        .option("starting.offsets", "[1, 2]").load().count()
    }
    assert(err.getMessage.contains("JSON object"), err.getMessage)
  }
}
