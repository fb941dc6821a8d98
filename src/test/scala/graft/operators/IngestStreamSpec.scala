package graft.operators

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming seen-store ingest dedup (Dedup.ingestStream): restart from
  * checkpoint with table-resident state, exactly-once epoch visibility,
  * and replay idempotence.
  */
class IngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir)

  test("two-phase ingest: state survives restart in the store table") {
    val src = Files.createTempDirectory("ingsrc").toString + "/docs"
    val store = Files.createTempDirectory("ingstore").toString
    val out = Files.createTempDirectory("ingout").toString
    val ckpt = Files.createTempDirectory("ingck").toString

    writeDocs(src, Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "alpha beta")))
    def run(): Unit = {
      val stream = spark.readStream.format("log").option("path", src).load()
        .select(col("doc_id"), col("text"))
      val q = Dedup.ingestStream(stream, store, out, "text", "doc_id", ckpt)
      q.awaitTermination()
    }
    run()
    val phase1 = spark.read.format("kv").option("path", out).load()
      .select("doc_id").as[Long].collect().toSet
    assert(phase1 == Set(1L, 2L), s"in-batch dedup failed: $phase1")

    // phase 2: NEW content plus re-deliveries of already-ingested content
    // in a separate run (fresh query, same checkpoint + store)
    writeDocs(src, Seq(
      (10L, "alpha  beta"), // normalized dup of doc 1 — must be dropped
      (11L, "epsilon zeta")))
    run()
    val phase2 = spark.read.format("kv").option("path", out).load()
      .select("doc_id").as[Long].collect().toSet
    assert(phase2 == Set(1L, 2L, 11L), s"seen-store restart failed: $phase2")
    // the store holds exactly the distinct fingerprints
    assert(spark.read.format("kv").option("path", store).load().distinct().count() == 3)
  }

  test("maintenance cycle: bucketize the grown store, later phases SPJ against it") {
    val src = Files.createTempDirectory("ingsrc2").toString + "/docs"
    val store = Files.createTempDirectory("ingstore2").toString
    val out = Files.createTempDirectory("ingout2").toString
    val ckpt = Files.createTempDirectory("ingck2").toString
    writeDocs(src, Seq.tabulate(60)(i => (i.toLong, s"unique doc number $i here")))
    def run(): Unit = {
      val stream = spark.readStream.format("log").option("path", src).load()
        .select(col("doc_id"), col("text"))
      Dedup.ingestStream(stream, store, out, "text", "doc_id", ckpt).awaitTermination()
    }
    run()
    // offline maintenance: compact + bucketize the fp store
    KvMerge.bucketize(spark, store, 4, Seq("fp"))
    assert(graft.sources.kv.KvBuckets.bucketsFor(store).isDefined)
    // next phase re-delivers everything plus new docs; the anti-join now
    // runs against the bucketized store (SPJ plan pinned in
    // KvBucketedJoinSpec — here we prove the cycle stays CORRECT)
    writeDocs(src, Seq.tabulate(60)(i => (100L + i, s"unique doc number $i here")) ++
      Seq((999L, "a genuinely new document")))
    run()
    val kept = spark.read.format("kv").option("path", out).load()
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (0L until 60L).toSet + 999L, s"cycle broke dedup: $kept")
    // the store append after bucketize withdraws the bucket claim (stale
    // meta must never affect correctness, only the elision)
    assert(graft.sources.kv.KvBuckets.bucketsFor(store).isEmpty)
  }

  test("a fully committed batch replays without losing its output") {
    // foreachBatch replay after BOTH sinks committed but before the
    // checkpoint commit: the replayed batch must not dedup against its
    // own previously committed fingerprints and erase its epoch
    val store = Files.createTempDirectory("ingreplay_s").toString
    val out = Files.createTempDirectory("ingreplay_o").toString
    val batch = Seq((1L, "first doc"), (2L, "second doc"), (3L, "first doc"))
      .toDF("doc_id", "text")
    Dedup.processIngestBatch(batch, store, out, "text", "doc_id", 0L)
    val first = spark.read.format("kv").option("path", out).load()
      .select("doc_id").as[Long].collect().toSet
    assert(first == Set(1L, 2L))
    // replay the SAME batch id with the store already holding epoch 0
    Dedup.processIngestBatch(batch, store, out, "text", "doc_id", 0L)
    val replayed = spark.read.format("kv").option("path", out).load()
      .select("doc_id").as[Long].collect().toSet
    assert(replayed == Set(1L, 2L), s"replay lost or duplicated output: $replayed")
    assert(spark.read.format("kv").option("path", store).load().count() == 2)
    // a NEW batch against the recovered state still dedups correctly
    Dedup.processIngestBatch(
      Seq((9L, "first doc"), (10L, "third doc")).toDF("doc_id", "text"),
      store, out, "text", "doc_id", 1L)
    val after = spark.read.format("kv").option("path", out).load()
      .select("doc_id").as[Long].collect().toSet
    assert(after == Set(1L, 2L, 10L), after)
  }

  test("epoch replay is idempotent; uncommitted epochs are invisible") {
    val dir = Files.createTempDirectory("ingepoch").toString
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    Dedup.writeEpoch(df, dir, 7L)
    Dedup.writeEpoch(df, dir, 7L) // replay: same names, same marker
    val got = spark.read.format("kv").option("path", dir).load()
    assert(got.count() == 2, "replayed epoch must overwrite, not duplicate")

    // simulate a crash before the marker: files present, no commit
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(graft.sources.ParquetIO.hadoopConf)
    Dedup.writeEpoch(Seq((3L, "z")).toDF("k", "v"), dir, 8L)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_commits/8"), false)
    val visible = spark.read.format("kv").option("path", dir).load().count()
    assert(visible == 2, "uncommitted epoch files must stay invisible")
  }
}
