package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnicodeNfcSpec extends SparkSpec {
  import spark.implicits._

  test("folds decomposed accents to composed form; ASCII and CJK pass through") {
    val df = Seq(
      (1L, "Cafe\u0301"),       // e + combining acute -> e-acute
      (2L, "Caf\u00e9"),           // already composed → unchanged
      (3L, "plain ascii text"),    // ASCII fast path
      (4L, "中文 text"),   // CJK is NFC-invariant
      (5L, "A\u030a")           // A + combining ring -> Angstrom A
    ).toDF("id", "s")
    val got = df.select(col("id"), UnicodeNfc.nfc(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "Caf\u00e9")
    assert(got(2L) == "Caf\u00e9")
    assert(got(3L) == "plain ascii text")
    assert(got(4L) == "中文 text")
    assert(got(5L) == "\u00c5")
    // equality after normalization is what dedup needs
    assert(got(1L) == got(2L))
  }

  test("null-safe and codegen-participating") {
    // spark.range keeps the projection live (literal frames constant-fold
    // to a LocalTableScan and hide the codegen question entirely)
    val df = spark.range(4).select(col("id"),
      when(col("id") % 2 === 0, concat(lit("Cafe\u0301 "), col("id").cast("string")))
        .as("s"))
    val out = df.select(col("id"), UnicodeNfc.nfc(col("s")).as("n"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.isNullAt(1)).toSeq == Seq(false, true, false, true))
    assert(rows(0).getString(1) == "Caf\u00e9 0")
  }
}
