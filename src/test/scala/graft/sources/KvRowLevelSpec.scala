package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL UPDATE / MERGE INTO / rewrite-DELETE through the kv catalog —
  * the group-based copy-on-write surface (SupportsRowLevelOperations).
  */
class KvRowLevelSpec extends SparkSpec {
  import spark.implicits._

  private def stage(): String = {
    graft.Tables.tuneForGates(spark)
    val dir = java.nio.file.Files.createTempDirectory("kvrlo").toString + "/t"
    Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "a"), (4L, 40.0, "c"))
      .toDF("k", "v", "tag")
      .write.format("kv").option("path", dir).mode("overwrite").save()
    dir
  }

  private def readAll(dir: String) =
    spark.read.format("kv").option("path", dir).load().orderBy("k")

  test("SQL UPDATE rewrites matching rows, copies the rest byte-identically") {
    val dir = stage()
    spark.sql(s"UPDATE kvcat.`$dir` SET v = v * 2 WHERE tag = 'a'")
    val got = readAll(dir).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 20.0), (2L, 20.0), (3L, 60.0), (4L, 40.0)))
    // multi-assignment referencing other columns
    spark.sql(s"UPDATE kvcat.`$dir` SET v = k + v, tag = 'x' WHERE k = 4")
    val r4 = readAll(dir).where(col("k") === 4L).head()
    assert(r4.getDouble(1) == 44.0 && r4.getString(2) == "x")
  }

  test("SQL MERGE INTO: matched update, matched delete, not-matched insert") {
    val dir = stage()
    Seq((2L, 200.0, "upd"), (4L, -1.0, "del"), (9L, 90.0, "new"))
      .toDF("k", "v", "op").createOrReplaceTempView("changes")
    spark.sql(
      s"""MERGE INTO kvcat.`$dir` t USING changes c ON t.k = c.k
         |WHEN MATCHED AND c.op = 'del' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = c.v
         |WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (c.k, c.v, c.op)
         |""".stripMargin)
    val got = readAll(dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 10.0, "a"), (2L, 200.0, "b"), (3L, 30.0, "a"),
      (9L, 90.0, "new")), got.toString)
  }

  test("DELETE with a non-metadata-translatable predicate falls to the rewrite path") {
    val dir = stage()
    // v + k is an expression the Filter API can't carry — before
    // SupportsRowLevelOperations this errored; now it rewrites
    spark.sql(s"DELETE FROM kvcat.`$dir` WHERE v + k > 32")
    assert(readAll(dir).select("k").as[Long].collect().toSeq == Seq(1L, 2L))
  }

  test("replace-data commit is the crash-safe swap: no tmp/backup residue, sidecar refreshed") {
    val dir = stage()
    spark.sql(s"UPDATE kvcat.`$dir` SET v = 0.0 WHERE k = 1")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(ParquetIO.hadoopConf)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir.rlo-tmp")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir.merge-old")))
    // catalog-less read still sees the full schema (sidecar re-recorded)
    assert(spark.read.format("kv").option("path", dir).load()
      .columns.toSeq == Seq("k", "v", "tag"))
    assert(readAll(dir).count() == 4)
  }
}
