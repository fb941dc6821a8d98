package graft.sources

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import org.apache.spark.sql.functions._

class QueueSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeMessage(dir: String, name: String, content: String): Unit =
    Files.write(Paths.get(dir, name), content.getBytes("UTF-8"))

  test("queue stream delivers each message once, in order, rate-limited") {
    val dir = Files.createTempDirectory("queue").toString
    val ckpt = Files.createTempDirectory("queueckpt").toString
    (0 until 5).foreach(i => writeMessage(dir, f"msg-$i%03d", s"payload-$i"))
    val q = spark.readStream.format("queue").option("path", dir)
      .option("maxMessagesPerTrigger", "2").load()
      .select(col("id"), col("payload").cast("string").as("body"))
      .writeStream.format("memory").queryName("queue_out")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("queue_out").orderBy("id")
        .as[(String, String)].collect().toSeq
      assert(rows == (0 until 5).map(i => (f"msg-$i%03d", s"payload-$i")))
      val perBatch = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(perBatch.forall(_ <= 2), s"rate limit: ${perBatch.mkString(",")}")
      // new message arrives → delivered exactly once
      writeMessage(dir, "msg-005", "payload-5")
      q.processAllAvailable()
      assert(spark.table("queue_out").count() == 6)
    } finally q.stop()
  }

  test("late message sorting before consumed names is delivered exactly once") {
    val dir = Files.createTempDirectory("queue2").toString
    val ckpt = Files.createTempDirectory("queue2ckpt").toString
    writeMessage(dir, "mmm-1", "m1")
    writeMessage(dir, "zzz-1", "z1")
    val q = spark.readStream.format("queue").option("path", dir)
      .option("maxMessagesPerTrigger", "1").load()
      .select(col("id"), col("payload").cast("string").as("body"))
      .writeStream.format("memory").queryName("queue2_out")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("queue2_out").count() == 2)
      // producer-chosen name that sorts BEFORE everything consumed so far:
      // a positional cursor would re-deliver old messages and skip this one
      writeMessage(dir, "aaa-0", "a0")
      q.processAllAvailable()
      val rows = spark.table("queue2_out").orderBy("id")
        .as[(String, String)].collect().toSeq
      assert(rows == Seq(("aaa-0", "a0"), ("mmm-1", "m1"), ("zzz-1", "z1")),
        s"each message exactly once, no skips: $rows")
      // acknowledged messages are archived out of the pending listing
      assert(graft.sources.queue.QueueSource.listMessages(dir).isEmpty)
    } finally q.stop()
  }

  test("queue batch read sees all pending messages") {
    val dir = Files.createTempDirectory("queueb").toString
    writeMessage(dir, "a", "x")
    writeMessage(dir, "b", "yz")
    val got = spark.read.format("queue").option("path", dir).load()
      .select(col("id"), length(col("payload")).as("n"))
      .orderBy("id").as[(String, Int)].collect().toSeq
    assert(got == Seq(("a", 1), ("b", 2)))
  }

  test("log source rate limit hot-reloads from a side file") {
    val dir = Files.createTempDirectory("loghot").toString
    val ckpt = Files.createTempDirectory("loghotckpt").toString
    val limitFile = Files.createTempDirectory("cfg").toString + "/limit"
    Files.writeString(Paths.get(limitFile), "3")
    // one shard of 12 rows via the kv writer
    val tmp = Files.createTempDirectory("t").toString
    (0 until 12).map(i => (i.toLong, s"m$i")).toDF("id", "body")
      .coalesce(1).write.format("kv").option("path", tmp).mode("overwrite").save()
    val p = ParquetIO.listFiles(tmp).head
    val fs = p.getFileSystem(ParquetIO.hadoopConf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    fs.rename(p, new org.apache.hadoop.fs.Path(dir, "s.parquet"))

    val q = spark.readStream.format("log").option("path", dir)
      .option("maxOffsetsPerTrigger", "100") // static value, overridden
      .option("rate.limit.file", limitFile).load()
      .writeStream.format("memory").queryName("hot_out")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("hot_out").count() == 12)
      val perBatch = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(perBatch.nonEmpty && perBatch.forall(_ <= 3),
        s"dynamic limit must cap batches at 3: ${perBatch.mkString(",")}")
    } finally q.stop()
  }
}
