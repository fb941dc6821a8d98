package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Wide decimals (p > 18 → FIXED_LEN_BYTE_ARRAY) and ArrayType columns in
  * the kv source — the reference's full ODPS type fidelity
  * (`emr-maxcompute/.../OdpsUtils.scala:398-457`: DECIMAL round-trip and
  * nested ARRAY conversion).
  */
class KvWideTypesSpec extends SparkSpec {
  import spark.implicits._

  test("wide decimal (28,6) round-trips exactly, including negatives and nulls") {
    val dir = Files.createTempDirectory("kvwide").toString
    val rows = Seq(
      (1L, "123456789012345678901.123456"),
      (2L, "-98765432109876543210.654321"),
      (3L, "0.000001"),
      (4L, null))
    val df = rows.toDF("id", "d_str")
      .select(col("id"), col("d_str").cast(DecimalType(28, 6)).as("d"))
    df.write.format("kv").option("path", dir).mode("overwrite").save()

    val back = spark.read.format("kv").option("path", dir).load()
    assert(back.schema("d").dataType == DecimalType(28, 6), back.schema.treeString)
    val got = back.orderBy("id").select("d").collect()
      .map(r => Option(r.getDecimal(0)).map(_.toPlainString))
    assert(got.toSeq == Seq(
      Some("123456789012345678901.123456"),
      Some("-98765432109876543210.654321"),
      Some("0.000001"),
      None))
  }

  test("array columns round-trip, including null elements and empty arrays") {
    val dir = Files.createTempDirectory("kvarr").toString
    val df = Seq(
      (1L, Seq[java.lang.Double](1.5, 2.5), Seq("a", "b")),
      (2L, Seq[java.lang.Double](3.0, null), Seq.empty[String]),
      (3L, Seq.empty[java.lang.Double], Seq("z")))
      .toDF("id", "xs", "tags")
    df.write.format("kv").option("path", dir).mode("overwrite").save()

    val back = spark.read.format("kv").option("path", dir).load()
    assert(back.schema("xs").dataType == ArrayType(DoubleType, containsNull = true))
    assert(back.schema("tags").dataType == ArrayType(StringType, containsNull = true))
    val got = back.orderBy("id")
      .select(col("id"), col("xs"), col("tags")).collect()
      .map(r => (r.getLong(0), r.getSeq[Any](1), r.getSeq[String](2)))
    assert(got(0) == ((1L, Seq(1.5, 2.5), Seq("a", "b"))))
    assert(got(1)._2 == Seq(3.0, null) && got(1)._3 == Seq.empty)
    assert(got(2)._2 == Seq.empty && got(2)._3 == Seq("z"))
  }

  test("filters on array columns stay residual; scalar pushdown still works beside them") {
    val dir = Files.createTempDirectory("kvarrf").toString
    Seq((1L, Seq(1.0)), (2L, Seq(2.0)), (3L, Seq(3.0))).toDF("id", "xs")
      .write.format("kv").option("path", dir).mode("overwrite").save()
    val got = spark.read.format("kv").option("path", dir).load()
      .filter(col("id") >= 2L && element_at(col("xs"), 1) < 3.0)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  test("map columns round-trip, including null values and empty maps") {
    val dir = Files.createTempDirectory("kvmap").toString
    val df = Seq(
      (1L, Map("a" -> java.lang.Double.valueOf(1.5), "b" -> java.lang.Double.valueOf(2.5))),
      (2L, Map("c" -> null.asInstanceOf[java.lang.Double])),
      (3L, Map.empty[String, java.lang.Double]))
      .toDF("id", "m")
    df.write.format("kv").option("path", dir).mode("overwrite").save()
    val back = spark.read.format("kv").option("path", dir).load()
    assert(back.schema("m").dataType ==
      MapType(StringType, DoubleType, valueContainsNull = true))
    val got = back.orderBy("id").select("m").collect()
      .map(_.getMap[String, Any](0).toMap)
    assert(got(0) == Map("a" -> 1.5, "b" -> 2.5))
    assert(got(1) == Map("c" -> null))
    assert(got(2) == Map.empty)
  }

  test("struct columns round-trip, including null fields, and field access works") {
    val dir = Files.createTempDirectory("kvstruct").toString
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, named_struct('rf', 'A', 'qty', 10L)),
        |  (2L, named_struct('rf', CAST(NULL AS STRING), 'qty', 20L))
        |AS t(id, meta)""".stripMargin)
    df.write.format("kv").option("path", dir).mode("overwrite").save()
    val back = spark.read.format("kv").option("path", dir).load()
    assert(back.schema("meta").dataType.isInstanceOf[StructType])
    val got = back.orderBy("id")
      .select(col("meta.rf"), col("meta.qty")).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1))).toSeq
    assert(got == Seq((Some("A"), 10L), (None, 20L)))
  }

  test("recursive nesting round-trips: array-of-struct, struct-of-struct, map-of-struct") {
    val dir = Files.createTempDirectory("kvdeep").toString
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L,
        |   array(named_struct('q', 10L, 'tag', 'x'), named_struct('q', 20L, 'tag', 'y')),
        |   named_struct('inner', named_struct('rf', 'A', 'n', 1L), 'mode', 'AIR'),
        |   map('m', named_struct('d', 0.25, 'ok', true))),
        |  (2L,
        |   array(named_struct('q', CAST(NULL AS BIGINT), 'tag', 'z')),
        |   named_struct('inner', CAST(NULL AS STRUCT<rf: STRING, n: BIGINT>), 'mode', 'RAIL'),
        |   map('m', CAST(NULL AS STRUCT<d: DOUBLE, ok: BOOLEAN>))),
        |  (3L,
        |   array(CAST(NULL AS STRUCT<q: BIGINT, tag: STRING>)),
        |   named_struct('inner', named_struct('rf', 'B', 'n', 3L), 'mode', CAST(NULL AS STRING)),
        |   map())
        |AS t(id, items, meta2, props)""".stripMargin)
    df.write.format("kv").option("path", dir).mode("overwrite").save()
    val back = spark.read.format("kv").option("path", dir).load()
    assert(back.schema("items").dataType ==
      ArrayType(StructType(Seq(StructField("q", LongType), StructField("tag", StringType))),
        containsNull = true), back.schema.treeString)
    val got = back.orderBy("id").select(
      element_at(col("items"), 1).getField("q").as("q1"),
      col("meta2.inner.rf").as("rf"),
      col("meta2.mode").as("mode"),
      col("props").getItem("m").getField("d").as("d")).collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toSeq
    assert(got == Seq(
      (Some(10L), Some("A"), Some("AIR"), Some(0.25)),
      (None, None, Some("RAIL"), None),
      (None, Some("B"), None, None)))
  }

  test("timestamps, dates, and decimals round-trip inside containers") {
    val dir = Files.createTempDirectory("kvdeepts").toString
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L,
        |   array(TIMESTAMP '2024-03-01 10:30:00', CAST(NULL AS TIMESTAMP)),
        |   named_struct('when', DATE '2024-03-01',
        |                'amt', CAST('123456789012345678901.1234' AS DECIMAL(28, 4))),
        |   map('k', CAST('42.5' AS DECIMAL(10, 2))))
        |AS t(id, ts_arr, rec, dm)""".stripMargin)
    df.write.format("kv").option("path", dir).mode("overwrite").save()
    val back = spark.read.format("kv").option("path", dir).load()
    assert(back.schema("rec").dataType ==
      StructType(Seq(StructField("when", DateType), StructField("amt", DecimalType(28, 4)))),
      back.schema.treeString)
    val r = back.select(
      element_at(col("ts_arr"), 1).cast("string"),
      element_at(col("ts_arr"), 2),
      col("rec.when").cast("string"),
      col("rec.amt").cast("string"),
      col("dm").getItem("k").cast("string")).collect().head
    assert(r.getString(0) == "2024-03-01 10:30:00")
    assert(r.isNullAt(1))
    assert(r.getString(2) == "2024-03-01")
    assert(r.getString(3) == "123456789012345678901.1234")
    assert(r.getString(4) == "42.50")
  }

  test("vector math composes with kv-stored embeddings (array<double> aggregate)") {
    val dir = Files.createTempDirectory("kvvec").toString
    Seq((1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(4.0, 5.0, 6.0))).toDF("id", "v")
      .write.format("kv").option("path", dir).mode("overwrite").save()
    val got = spark.read.format("kv").option("path", dir).load()
      .select(aggregate(zip_with(col("v"), col("v"), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x).as("norm2"))
      .orderBy("norm2").as[Double].collect().toSeq
    assert(got == Seq(14.0, 77.0))
  }
}
