package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class LogContinuousSpec extends SparkSpec {
  import spark.implicits._

  test("continuous trigger streams rows through per-shard long-running readers (T4)") {
    val dir = Files.createTempDirectory("logcont").toString
    val ckpt = Files.createTempDirectory("logcontckpt").toString
    val tmp = Files.createTempDirectory("t").toString
    (0 until 20).map(i => (i.toLong, s"m$i")).toDF("id", "body")
      .coalesce(2).write.format("kv").option("path", tmp).mode("overwrite").save()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(ParquetIO.hadoopConf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    ParquetIO.listFiles(tmp).zipWithIndex.foreach { case (p, i) =>
      fs.rename(p, new org.apache.hadoop.fs.Path(dir, s"shard-$i.parquet"))
    }

    val q = spark.readStream.format("log").option("path", dir).load()
      .select(col("id"), col("body"))  // continuous mode: map-like ops only
      .writeStream.format("memory").queryName("cont_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.Continuous("200 milliseconds"))
      .start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("cont_out").count() < 20 &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      val got = spark.table("cont_out").select("id").as[Long].collect().toSet
      assert(got == (0L until 20L).toSet, s"got ${got.size} rows")
    } finally q.stop()
  }
}
