package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `ALTER TABLE … ADD COLUMN` through the kv catalog: metadata-only
  * schema evolution — the sidecar gains the column, NO file is
  * rewritten, pre-evolution files read NULL for it. Everything except
  * ADD COLUMN stays rejected.
  */
class KvAlterSpec extends SparkSpec {
  import spark.implicits._

  private def stage(): String = {
    graft.Tables.tuneForGates(spark)
    val dir = java.nio.file.Files.createTempDirectory("kvalter").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("kv").option("path", dir).mode("overwrite").save()
    dir
  }

  test("ADD COLUMN is metadata-only; old files read null-filled; appends carry it") {
    val dir = stage()
    val filesBefore = ParquetIO.listFiles(dir).map(_.toString).sorted
    spark.sql(s"ALTER TABLE kvcat.`$dir` ADD COLUMN w BIGINT")
    // no rewrite happened
    assert(ParquetIO.listFiles(dir).map(_.toString).sorted == filesBefore)
    // the column is immediately visible, null for pre-evolution rows
    val evolved = spark.read.format("kv").option("path", dir).load()
    assert(evolved.columns.toSeq == Seq("k", "v", "w"))
    assert(evolved.where(col("w").isNull).count() == 2)
    // appended rows carry values; old rows stay null
    Seq((3L, "c", 30L)).toDF("k", "v", "w")
      .write.format("kv").option("path", dir).mode("append").save()
    val all = spark.read.format("kv").option("path", dir).load()
      .orderBy("k").collect()
    assert(all.map(r => if (r.isNullAt(2)) -1L else r.getLong(2)).toSeq ==
      Seq(-1L, -1L, 30L))
    // multi-column add in one statement works too
    spark.sql(s"ALTER TABLE kvcat.`$dir` ADD COLUMNS (x DOUBLE, y STRING)")
    assert(spark.read.format("kv").option("path", dir).load()
      .columns.toSeq == Seq("k", "v", "w", "x", "y"))
  }

  test("duplicate adds and non-ADD changes fail fast") {
    val dir = stage()
    val dup = intercept[Exception] {
      spark.sql(s"ALTER TABLE kvcat.`$dir` ADD COLUMN v BIGINT")
    }
    assert(dup.getMessage.toLowerCase.contains("already exists"), dup.getMessage)
    val drop = intercept[Exception] {
      spark.sql(s"ALTER TABLE kvcat.`$dir` DROP COLUMN v")
    }
    assert(drop.getMessage.contains("ADD COLUMN only") ||
      drop.getMessage.toLowerCase.contains("unsupported"), drop.getMessage)
  }
}
