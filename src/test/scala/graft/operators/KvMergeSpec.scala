package graft.operators

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class KvMergeSpec extends SparkSpec {
  import spark.implicits._

  test("merge applies INSERT/UPSERT/UPDATE/DELETE per row (W7)") {
    val dir = Files.createTempDirectory("kvmerge").toString + "/t"
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("k", "name", "v")
      .write.format("kv").option("path", dir).mode("append").save()

    val batch = Seq(
      ("INSERT", 4L, "d", 4.0),   // new key → inserted
      ("INSERT", 1L, "dup", 0.0), // existing key → ignored
      ("UPSERT", 2L, "b2", 22.0), // replaced
      ("UPSERT", 5L, "e", 5.0),   // inserted
      ("UPDATE", 3L, "c2", 33.0), // replaced
      ("UPDATE", 9L, "x", 0.0),   // no such key → no-op
      ("DELETE", 1L, null, 0.0))  // removed
      .toDF("op", "k", "name", "v")

    KvMerge.merge(spark, dir, batch, "op", Seq("k"))
    val got = spark.read.format("kv").option("path", dir).load()
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((2L, "b2", 22.0), (3L, "c2", 33.0), (4L, "d", 4.0), (5L, "e", 5.0)))
  }

  test("merge into a non-existent table creates it from inserts/upserts") {
    val dir = Files.createTempDirectory("kvmerge2").toString + "/t"
    val batch = Seq(("INSERT", 1L, "a"), ("UPSERT", 2L, "b"), ("DELETE", 3L, "x"))
      .toDF("op", "k", "name")
    KvMerge.merge(spark, dir, batch, "op", Seq("k"))
    val got = spark.read.format("kv").option("path", dir).load()
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b")))
  }
}
