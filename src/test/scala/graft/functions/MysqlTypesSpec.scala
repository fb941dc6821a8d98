package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed mysql image decoding: numerics (signed/unsigned), decimal,
  * temporal types with mysql zero-date semantics, charset repair, and
  * hex binary — row-local, codegen'd, deterministic.
  */
class MysqlTypesSpec extends SparkSpec {
  import spark.implicits._

  private def one(value: String, declared: String) =
    Seq(Option(value)).toDF("v")
      .select(MysqlTypes.convert(col("v"), declared).as("out"))

  test("integer family: widths, unsigned promotion, full unsigned-bigint range") {
    assert(one("-42", "tinyint").head().getInt(0) == -42)
    assert(one("3000000000", "int unsigned").head().getLong(0) == 3000000000L)
    assert(one("9223372036854775807", "bigint").head().getLong(0) == Long.MaxValue)
    val u = one("18446744073709551615", "bigint unsigned").head().getDecimal(0)
    assert(u == new java.math.BigDecimal("18446744073709551615"))
    assert(one("7", "bit(3)").head().getLong(0) == 7L)
    assert(one("2024", "year").head().getInt(0) == 2024)
  }

  test("decimal keeps declared precision/scale; float/double parse") {
    val d = one("12345.6789", "decimal(10,4)")
    assert(d.schema.head.dataType == DecimalType(10, 4))
    assert(d.head().getDecimal(0) == new java.math.BigDecimal("12345.6789"))
    assert(one("0.25", "float").head().getFloat(0) == 0.25f)
    assert(one("1.5", "double").head().getDouble(0) == 1.5)
  }

  test("temporal: datetime micros survive, zero-dates decode to NULL, TIME stays text") {
    val ts = one("2021-03-04 05:06:07.250123", "datetime(6)").head().getTimestamp(0)
    assert(ts.toInstant == java.time.Instant.parse("2021-03-04T05:06:07.250123Z"))
    assert(one("0000-00-00", "date").head().isNullAt(0))
    assert(one("0000-00-00 00:00:00", "timestamp").head().isNullAt(0))
    assert(one("838:59:59", "time").head().getString(0) == "838:59:59")
  }

  test("charset repair: utf8 bytes transported as latin1 decode back") {
    val mojibake = new String("café".getBytes("UTF-8"), "ISO-8859-1")
    assert(one(mojibake, "varchar(32) charset utf8mb4").head().getString(0) == "café")
    // latin1-declared columns pass through untouched
    assert(one(mojibake, "varchar(32) charset latin1").head().getString(0) == mojibake)
  }

  test("binary family decodes hex; typedImage yields NULLs for absent keys") {
    assert(one("414243", "varbinary(8)").head().getAs[Array[Byte]](0).toSeq ==
      "ABC".getBytes.toSeq)
    val row = Seq(Map("a" -> "1")).toDF("img")
      .select(MysqlTypes.typedImage(col("img"),
        Seq("a" -> "int", "missing" -> "decimal(5,2)")).as("t"))
      .select(col("t.a"), col("t.missing")).head()
    assert(row.getInt(0) == 1 && row.isNullAt(1))
  }
}
