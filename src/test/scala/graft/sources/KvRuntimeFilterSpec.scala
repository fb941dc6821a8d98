package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import graft.sources.kv.{KvInputPartition, KvScan, KvScanBuilder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Runtime (DPP-style) filtering on the kv scan: join keys pushed at
  * execution time prune whole files by footer min/max before any task
  * runs — the Iceberg-style `SupportsRuntimeFiltering` contract. Purely
  * advisory (the join re-filters), so stats-only evaluation is safe.
  */
class KvRuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  /** 4 part files, each holding one disjoint key range of 100. */
  private def writeRangedTable(): String = {
    val dir = Files.createTempDirectory("kvrt").toString
    (0 until 4).foreach { part =>
      (part * 100 until (part + 1) * 100)
        .map(i => (i.toLong, s"name-$i", i * 1.5)).toDF("k", "name", "score")
        .coalesce(1).write.format("kv").option("path", dir).mode("append").save()
    }
    dir
  }

  private def scanOf(dir: String): KvScan = {
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("name", StringType), StructField("score", DoubleType)))
    new KvScanBuilder(dir, schema, 1000, 128L).build().asInstanceOf[KvScan]
  }

  private def rowsOf(scan: KvScan): Long =
    scan.planInputPartitions()
      .flatMap(_.asInstanceOf[KvInputPartition].chunks).map(_.rows).sum

  test("runtime In/EqualTo filters prune files by footer stats") {
    val dir = writeRangedTable()
    val scan = scanOf(dir)
    assert(rowsOf(scan) == 400, "before filtering: all four files planned")
    scan.filter(Array[Filter](In("k", Array(105L, 150L))))
    assert(rowsOf(scan) == 100, "only the 100..199 file survives")
    scan.filter(Array[Filter](EqualTo("k", 399L)))
    assert(rowsOf(scan) == 100, "only the 300..399 file survives")
    scan.filter(Array[Filter](EqualTo("k", 5000L)))
    assert(rowsOf(scan) == 0, "out-of-range key prunes every file")
    // string stats prune too (ASCII-comparable)
    scan.filter(Array[Filter](EqualTo("name", "name-42")))
    assert(rowsOf(scan) > 0 && rowsOf(scan) < 400)
  }

  test("int-typed join keys prune too (filter values widen like stats)") {
    // INT32 storage: stats normalize to Long, runtime filter values
    // arrive as Int — without widening the comparison is undecidable and
    // pruning silently no-ops for every int-keyed join
    val dir = Files.createTempDirectory("kvrti").toString
    (0 until 4).foreach { part =>
      (part * 100 until (part + 1) * 100)
        .map(i => (i, s"name-$i")).toDF("ik", "name")
        .coalesce(1).write.format("kv").option("path", dir).mode("append").save()
    }
    val schema = StructType(Seq(StructField("ik", IntegerType),
      StructField("name", StringType)))
    val scan = new KvScanBuilder(dir, schema, 1000, 128L).build().asInstanceOf[KvScan]
    assert(rowsOf(scan) == 400)
    scan.filter(Array[Filter](In("ik", Array(105, 150))))
    assert(rowsOf(scan) == 100, "int-keyed runtime filter must prune files")
    scan.filter(Array[Filter](EqualTo("ik", 5000)))
    assert(rowsOf(scan) == 0)
  }

  test("filterAttributes exposes the read columns") {
    val dir = writeRangedTable()
    assert(scanOf(dir).filterAttributes().map(_.describe()).toSet ==
      Set("k", "name", "score"))
  }

  test("broadcast join over a filtered dim returns exact results") {
    val dir = writeRangedTable()
    val fact = spark.read.format("kv").option("path", dir).load()
    val dim = Seq((105L, "a"), (150L, "b")).toDF("k", "tag")
    val joined = fact.join(broadcast(dim), "k")
      .select(col("k"), col("name"), col("tag")).orderBy("k")
    assert(joined.as[(Long, String, String)].collect().toSeq ==
      Seq((105L, "name-105", "a"), (150L, "name-150", "b")))
  }

  test("unsupported filter shapes keep everything (no false pruning)") {
    val dir = writeRangedTable()
    val scan = scanOf(dir)
    scan.filter(Array[Filter](
      org.apache.spark.sql.sources.StringStartsWith("name", "name-1")))
    assert(rowsOf(scan) == 400)
  }
}
