package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL registration parity: every registered function must answer
  * exactly like its Column-API twin.
  */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL functions equal their Column-API twins") {
    GraftFunctions.registerAll(spark)
    Seq((1L, "hello  world of text", Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("id", "t", "a", "b").createOrReplaceTempView("gf")

    val viaSql = spark.sql(
      """SELECT unicode_nfc(t) AS n, array_dot(a, b) AS d, ws_tokens(t) AS w,
        |  splitmix64(id) AS h, string_hash64(t, 42) AS sh,
        |  gram_coverage(ws_tokens(t), 2) AS gc,
        |  size(cdc_chunks(t, 4)) AS nc
        |FROM gf""".stripMargin).collect()(0)

    val df = spark.table("gf")
    val viaApi = df.select(
      UnicodeNfc.nfc(col("t")).as("n"),
      VectorExpressions.arrayDot(col("a"), col("b")).as("d"),
      WhitespaceTokens.wsTokens(col("t")).as("w"),
      Sketches.splitmixLong(col("id")).as("h"),
      toColumn(Sketches.StringHash64Expr(exprOf(col("t")), 42L)).as("sh"),
      GramCoverage.gramCoverage(WhitespaceTokens.wsTokens(col("t")), 2).as("gc"),
      size(CdcChunks.cdcChunks(col("t"), 4)).as("nc")).collect()(0)

    assert(viaSql.toString == viaApi.toString)
    assert(viaSql.getAs[Double]("d") == 32.0)
    assert(viaSql.getAs[scala.collection.Seq[String]]("w").toSeq ==
      Seq("hello", "world", "of", "text"))
  }

  test("non-literal static args fail fast") {
    GraftFunctions.registerAll(spark)
    Seq((1L, "x")).toDF("id", "t").createOrReplaceTempView("gf2")
    val e = intercept[Exception] {
      spark.sql("SELECT cdc_chunks(t, id) FROM gf2").collect()
    }
    assert(e.getMessage.contains("maskBits") || e.getMessage.contains("literal"),
      e.getMessage)
  }
}
