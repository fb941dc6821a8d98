package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming shapes from the reference's baseline corpus that can't go
  * through the batch Verify gate: the q40 left-outer stream-stream join
  * with dual watermarks, and the complete-mode ORDER BY + LIMIT used by
  * 30 of the 34 corpus queries (SURVEY.md §2.5).
  */
class StreamingCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def writeShard(dir: String, name: String, rows: Seq[(String, Long, Double)]): Unit = {
    val tmp = Files.createTempDirectory("t").toString
    rows.toDF("ts_s", "k", "v")
      .select(col("ts_s").cast("timestamp").as("ts"), col("k"), col("v"))
      .coalesce(1).write.format("kv").option("path", tmp).mode("overwrite").save()
    val p = graft.sources.ParquetIO.listFiles(tmp).head
    val fs = p.getFileSystem(graft.sources.ParquetIO.hadoopConf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    fs.rename(p, new org.apache.hadoop.fs.Path(dir, name))
  }

  test("q40 shape: left-outer stream-stream join with dual watermarks") {
    val dirL = Files.createTempDirectory("ssl").toString
    val dirR = Files.createTempDirectory("ssr").toString
    val ckpt = Files.createTempDirectory("ssckpt").toString
    writeShard(dirL, "a.parquet", Seq(
      ("2024-01-01 00:00:05", 1L, 1.0), ("2024-01-01 00:00:10", 2L, 2.0),
      ("2024-01-01 00:00:15", 3L, 3.0)))
    writeShard(dirR, "a.parquet", Seq(
      ("2024-01-01 00:00:06", 1L, 10.0), ("2024-01-01 00:00:12", 2L, 20.0)))

    val left = spark.readStream.format("log").option("path", dirL).load()
      .withWatermark("ts", "30 seconds")
      .select(col("ts").as("l_ts"), col("k"), col("v").as("l_v"))
    val right = spark.readStream.format("log").option("path", dirR).load()
      .withWatermark("ts", "60 seconds")
      .select(col("ts").as("r_ts"), col("k").as("r_k"), col("v").as("r_v"))
    val joined = left.join(right,
      col("k") === col("r_k") &&
        col("r_ts") >= col("l_ts") - expr("interval 10 seconds") &&
        col("r_ts") <= col("l_ts") + expr("interval 10 seconds"),
      "left_outer")

    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("q40_out")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // advance both watermarks far enough to emit the unmatched left row
      writeShard(dirL, "b.parquet", Seq(("2024-01-01 00:10:00", 99L, 0.0)))
      writeShard(dirR, "b.parquet", Seq(("2024-01-01 00:10:00", 99L, 0.0)))
      q.processAllAvailable()
      q.processAllAvailable()
      val rows = spark.table("q40_out")
        .select(col("k"), col("r_v")).collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(rows.contains((1L, Some(10.0))), rows.toString)
      assert(rows.contains((2L, Some(20.0))), rows.toString)
      assert(rows.contains((3L, None)), s"unmatched left row must emit with nulls: $rows")
    } finally q.stop()
  }

  test("complete-mode aggregation with ORDER BY + LIMIT (30/34 corpus queries)") {
    val dir = Files.createTempDirectory("complete").toString
    val ckpt = Files.createTempDirectory("completeckpt").toString
    writeShard(dir, "a.parquet", Seq(
      ("2024-01-01 00:00:05", 1L, 5.0), ("2024-01-01 00:00:06", 2L, 3.0),
      ("2024-01-01 00:00:07", 1L, 2.0), ("2024-01-01 00:00:08", 3L, 1.0)))
    val agg = spark.readStream.format("log").option("path", dir).load()
      .groupBy(col("k")).agg(sum(col("v")).as("total"))
      .orderBy(col("total").desc).limit(2)
    val q = agg.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("complete_out")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("complete_out").as[(Long, Double)].collect().toSeq ==
        Seq((1L, 7.0), (2L, 3.0)))
      // more data → complete mode recomputes the full top-k
      writeShard(dir, "b.parquet", Seq(("2024-01-01 00:00:09", 3L, 9.0)))
      q.processAllAvailable()
      assert(spark.table("complete_out").as[(Long, Double)].collect().toSeq ==
        Seq((3L, 10.0), (1L, 7.0)))
    } finally q.stop()
  }

  test("session windows aggregate across micro-batches (stateful gap sessions)") {
    val dir = Files.createTempDirectory("sesswin").toString
    val ckpt = Files.createTempDirectory("sesswinck").toString
    // batch 1: two events 10s apart (same session at a 2-minute gap)
    writeShard(dir, "a.parquet", Seq(
      ("2024-01-01 00:00:00", 1L, 1.0), ("2024-01-01 00:00:10", 1L, 2.0)))
    val q = spark.readStream.format("log").option("path", dir).load()
      .groupBy(col("k"),
        session_window(col("ts"), "2 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .select(col("k"), col("n"), col("total"))
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("sess_out")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("sess_out").as[(Long, Long, Double)].collect().toSeq ==
        Seq((1L, 2L, 3.0)), "one merged session")

      // batch 2: an event INSIDE the gap extends the same session; one far
      // beyond it opens a second session
      writeShard(dir, "b.parquet", Seq(
        ("2024-01-01 00:01:00", 1L, 4.0), ("2024-01-01 01:00:00", 1L, 8.0)))
      q.processAllAvailable()
      val rows = spark.table("sess_out").as[(Long, Long, Double)]
        .collect().sortBy(_._3).toSeq
      assert(rows == Seq((1L, 3L, 7.0), (1L, 1L, 8.0)),
        s"session state must merge across batches: $rows")
    } finally q.stop()
  }

  test("TTL dedup: dropDuplicatesWithinWatermark bounds state and re-admits after expiry") {
    val dir = Files.createTempDirectory("ttldedup").toString
    val ckpt = Files.createTempDirectory("ttldedupck").toString
    writeShard(dir, "a.parquet", Seq(
      ("2024-01-01 00:00:05", 1L, 1.0), ("2024-01-01 00:00:06", 1L, 2.0)))
    val q = spark.readStream.format("log").option("path", dir).load()
      .withWatermark("ts", "30 seconds")
      .dropDuplicatesWithinWatermark("k")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ttl_out")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      def countFor(k: Long): Long =
        spark.table("ttl_out").where(col("k") === k).count()
      assert(countFor(1L) == 1, "in-batch duplicate collapses to one row")

      // within the watermark window → suppressed; a fresh key passes
      writeShard(dir, "b.parquet", Seq(
        ("2024-01-01 00:00:20", 1L, 3.0), ("2024-01-01 00:00:21", 2L, 4.0)))
      q.processAllAvailable()
      assert(countFor(1L) == 1, "duplicate within the watermark is dropped")
      assert(countFor(2L) == 1)

      // advance the watermark far past the key's expiry → state evicted
      writeShard(dir, "c.parquet", Seq(("2024-01-01 00:20:00", 99L, 0.0)))
      q.processAllAvailable()
      // the SAME key arriving after eviction is re-admitted: the state is
      // genuinely TTL-bounded, not a grow-forever set (the 100 TB
      // difference vs plain dropDuplicates)
      writeShard(dir, "d.parquet", Seq(("2024-01-01 00:30:00", 1L, 9.0)))
      q.processAllAvailable()
      assert(countFor(1L) == 2, "key re-admitted after its state expired")
    } finally q.stop()
  }
}
