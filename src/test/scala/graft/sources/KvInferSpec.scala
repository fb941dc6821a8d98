package graft.sources

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import graft.SparkSpec
import graft.sources.kv.KvSchemaMeta
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-less kv reads: persisted `_meta/schema.json` sidecar >
  * union-of-footers fallback. Sparse attributes (present only in some
  * part files) must stay visible either way, and a corrupt sidecar
  * degrades to the footer union, never an error.
  */
class KvInferSpec extends SparkSpec {
  import spark.implicits._

  /** Two appends with different column sets; returns the table dir. */
  private def stageSparse(): String = {
    val dir = Files.createTempDirectory("kvinfer").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "name")
      .coalesce(1).write.format("kv").option("path", dir).mode("overwrite").save()
    Seq((3L, "c", 30.5), (4L, "d", 40.5)).toDF("k", "name", "score")
      .coalesce(1).write.format("kv").option("path", dir).mode("append").save()
    dir
  }

  test("persisted sidecar: catalog-less read sees the union incl. sparse column") {
    val dir = stageSparse()
    assert(KvSchemaMeta.read(dir).map(_.fieldNames.toSet).contains(Set("k", "name", "score")))
    val df = spark.read.format("kv").option("path", dir).load()
    assert(df.schema.fieldNames.toSet == Set("k", "name", "score"))
    assert(df.where(col("score").isNull).select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
    assert(df.agg(round(sum(col("score")), 1)).head().getDouble(0) == 71.0)
  }

  test("footer union: sidecar deleted, sparse column still inferred") {
    val dir = stageSparse()
    val meta = new Path(dir, "_meta/schema.json")
    meta.getFileSystem(ParquetIO.hadoopConf).delete(meta, false)
    val df = spark.read.format("kv").option("path", dir).load()
    assert(df.schema.fieldNames.toSet == Set("k", "name", "score"))
    assert(df.count() == 4)
  }

  test("corrupt sidecar degrades to footer union, never an error") {
    val dir = stageSparse()
    val meta = new Path(dir, "_meta/schema.json")
    val fs = meta.getFileSystem(ParquetIO.hadoopConf)
    val out = fs.create(meta, true)
    out.write("{not json".getBytes("UTF-8")); out.close()
    val df = spark.read.format("kv").option("path", dir).load()
    assert(df.schema.fieldNames.toSet == Set("k", "name", "score"))
  }

  test("sidecar survives type fidelity: struct/array/decimal round-trip the json") {
    val s = StructType(Seq(
      StructField("k", LongType),
      StructField("d", DecimalType(28, 4)),
      StructField("arr", ArrayType(DoubleType)),
      StructField("st", StructType(Seq(StructField("a", StringType))))))
    val dir = Files.createTempDirectory("kvinfmeta").toString
    KvSchemaMeta.record(dir, s)
    assert(KvSchemaMeta.read(dir).contains(s))
    // a second record unions by name, first type wins
    KvSchemaMeta.record(dir, StructType(Seq(
      StructField("k", IntegerType), StructField("extra", BooleanType))))
    val merged = KvSchemaMeta.read(dir).get
    assert(merged("k").dataType == LongType)
    assert(merged.fieldNames.toSet == Set("k", "d", "arr", "st", "extra"))
  }
}
