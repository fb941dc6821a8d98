package graft.sources

import graft.SparkSpec
import graft.sources.kv.{KvBloom, KvInputPartition, KvScan}
import org.apache.spark.sql.functions._

/** Per-file Bloom pruning: point lookups on an UNCLUSTERED column plan
  * only the files that might hold the key (zone maps can't help — every
  * file's min/max spans the domain), absent keys plan ZERO files, and
  * non-equality predicates never consult the filter. No false
  * negatives, ever.
  */
class KvBloomSpec extends SparkSpec {
  import spark.implicits._

  /** 8 files, file i holding the 100 keys ≡ i (mod 8) out of 0..799 —
    * every file's [min, max] spans ~the whole key domain, so zone maps
    * cannot prune anything here. Exactly the unclustered layout where
    * only a Bloom filter can prove a key's absence per file.
    */
  private def stage(): String = {
    val dir = java.nio.file.Files.createTempDirectory("kvbloom").toString + "/t"
    (0 until 8).foreach { i =>
      (0L until 800L).filter(_ % 8 == i).map(k => (k, s"v$k")).toDF("k", "v")
        .coalesce(1)
        .write.format("kv").option("path", dir).mode("append").save()
    }
    KvBloom.build(spark, dir, Seq("k", "v"))
    dir
  }

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Set[String] = {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    // sparkPlan: the physical tree BEFORE adaptive wrapping hides the scan
    val scan = df.queryExecution.sparkPlan.collectFirst {
      case b: BatchScanExec if b.scan.isInstanceOf[KvScan] => b.scan.asInstanceOf[KvScan]
    }.get
    scan.toBatch.planInputPartitions()
      .flatMap(_.asInstanceOf[KvInputPartition].chunks.map(_.file)).toSet
  }

  test("point lookups prune to the owning file; absent keys plan zero files") {
    val dir = stage()
    def read() = spark.read.format("kv").option("path", dir).load()
    assert(ParquetIO.listFiles(dir).length == 8)

    // k = 50 lives in file (50 % 8): exactly one file planned, row found
    val hit = read().filter(col("k") === 50L)
    assert(plannedFiles(hit).size == 1, "equality lookup should plan 1 file")
    assert(hit.collect().map(_.getString(1)).toSeq == Seq("v50"))

    // an absent key proves absence through every file's bloom: 0 files
    val miss = read().filter(col("k") === 5000L)
    assert(plannedFiles(miss).isEmpty, "absent key should plan no files")
    assert(miss.count() == 0)

    // IN over three files (+ one absent) plans exactly those three
    val in = read().filter(col("k").isin(1L, 2L, 3L, 5000L))
    assert(plannedFiles(in).size == 3)
    assert(in.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))

    // string-column equality prunes too (xxhash64 over UTF8)
    val sv = read().filter(col("v") === "v123")
    assert(plannedFiles(sv).size == 1)
    assert(sv.select("k").as[Long].collect().toSeq == Seq(123L))

    // range predicates never consult the bloom: all 8 files planned,
    // every row accounted for (no false negatives anywhere)
    val range = read().filter(col("k") >= 700L)
    assert(plannedFiles(range).size == 8)
    assert(range.count() == 100)
    assert(read().count() == 800)
  }

  test("files not covered by the sidecar are never pruned; corrupt sidecar degrades safely") {
    val dir = stage()
    // a later append is NOT in the sidecar — lookups must still see it
    Seq((9999L, "late")).toDF("k", "v").coalesce(1)
      .write.format("kv").option("path", dir).mode("append").save()
    val late = spark.read.format("kv").option("path", dir).load()
      .filter(col("k") === 9999L)
    assert(late.count() == 1, "uncovered file must never be pruned")

    // corrupt sidecar: pruning silently disabled, results intact
    val p = new org.apache.hadoop.fs.Path(dir, "_index/bloom.json")
    val fs = p.getFileSystem(ParquetIO.hadoopConf)
    val out = fs.create(p, true); out.write("not json".getBytes); out.close()
    val all = spark.read.format("kv").option("path", dir).load()
      .filter(col("k") === 50L)
    assert(all.count() == 1)
  }
}
