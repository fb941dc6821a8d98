package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import graft.sources.cdc.Cdc
import graft.functions.CdcFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merge-on-read CDC apply: scan-time fold of the changelog tail over an
  * immutable base — read-equivalent to the copy-on-write `applyChanges`
  * path, without the per-batch base rewrite (the 100 TB apply layout).
  * Compaction folds a pinned changelog prefix into a new base (atomic
  * swap) and advances a watermark; idempotent if the watermark write is
  * lost (touched keys are replaced, not appended).
  */
class CdcMergeOnReadSpec extends SparkSpec {
  import spark.implicits._

  private def changeBatch(rows: Seq[(Long, String, String, Long)]): DataFrame =
    // (pk, record_type, val, ts)
    rows.toDF("pk", "rt", "v", "ts").select(
      col("rt").as(RecordTypeCol), col("ts").as(RecordTimestampCol),
      col("pk"), col("v"),
      when(col("rt") === "DELETE", lit(null: String)).otherwise("PUT")
        .as(columnTypeCol("v")))

  test("view ≡ applyChanges with an empty base, after compaction, and over the pending tail") {
    val log = Files.createTempDirectory("morlog").toString
    val base = Files.createTempDirectory("morbase").toString + "/t"
    Cdc.appendBatch(changeBatch(Seq(
      (1L, "PUT", "a", 1L), (2L, "PUT", "b", 1L), (3L, "PUT", "c", 1L))), log)
    Cdc.appendBatch(changeBatch(Seq(
      (2L, "UPDATE", "b2", 2L), (4L, "PUT", "d", 2L))), log)

    def image(df: DataFrame): Set[(Long, String)] =
      df.select("pk", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val full = spark.read.format("cdc").option("path", log).load()
    val expect2 = image(Cdc.applyChanges(full, Seq("pk")))

    // empty base: the view IS the fold
    assert(image(Cdc.mergeOnReadView(spark, base, log, Seq("pk"))) == expect2)

    // compact both files → base materialized, view unchanged
    Cdc.compact(spark, base, log, Seq("pk"))
    assert(Cdc.compactedFiles(base) == 2L)
    assert(image(spark.read.format("kv").option("path", base).load()) == expect2)
    assert(image(Cdc.mergeOnReadView(spark, base, log, Seq("pk"))) == expect2)

    // pending tail after the watermark: UPDATE + DELETE fold at scan time
    Cdc.appendBatch(changeBatch(Seq(
      (1L, "DELETE", null, 3L), (4L, "UPDATE", "d2", 3L), (5L, "PUT", "e", 3L))), log)
    val expect3 = image(Cdc.applyChanges(
      spark.read.format("cdc").option("path", log).load(), Seq("pk")))
    assert(expect3 == Set((2L, "b2"), (3L, "c"), (4L, "d2"), (5L, "e")))
    assert(image(Cdc.mergeOnReadView(spark, base, log, Seq("pk"))) == expect3)
    // base unchanged on disk — no copy-on-write rewrite happened
    assert(image(spark.read.format("kv").option("path", base).load()) == expect2)

    // second compaction consumes the tail
    Cdc.compact(spark, base, log, Seq("pk"))
    assert(Cdc.compactedFiles(base) == 3L)
    assert(image(spark.read.format("kv").option("path", base).load()) == expect3)
    assert(image(Cdc.mergeOnReadView(spark, base, log, Seq("pk"))) == expect3)
  }

  test("stale watermark (crash between swap and watermark write) is idempotent") {
    val log = Files.createTempDirectory("morlog2").toString
    val base = Files.createTempDirectory("morbase2").toString + "/t"
    Cdc.appendBatch(changeBatch(Seq((1L, "PUT", "a", 1L), (2L, "PUT", "b", 1L))), log)
    Cdc.compact(spark, base, log, Seq("pk"))
    // simulate the crash: roll the watermark back to 0 — files re-fold
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(ParquetIO.hadoopConf)
    val wm = new org.apache.hadoop.fs.Path(base, "_compact_watermark")
    val out = fs.create(wm, true); out.write("0".getBytes); out.close()
    val got = Cdc.mergeOnReadView(spark, base, log, Seq("pk"))
      .select("pk", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b")), s"re-fold must replace, not duplicate: $got")
  }
}
