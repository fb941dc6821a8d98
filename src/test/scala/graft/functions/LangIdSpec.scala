package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangIdSpec extends SparkSpec {
  import spark.implicits._

  test("detects major languages from characteristic text") {
    val samples = Seq(
      ("the cat sat on the mat and it was happy with his food", "en"),
      ("der Hund ist nicht mit der Katze und das ist ein Problem", "de"),
      ("le chat est dans la maison et il est avec les enfants", "fr"),
      ("el perro es grande y no come con los gatos en la casa", "es"),
      ("这是一个中文句子用来测试语言识别", "zh"),
      ("これはにほんごのぶんしょうです", "ja"),
      ("это русское предложение для теста", "ru"),
      ("هذه جملة عربية للاختبار", "ar"))
    val got = samples.toDF("text", "expected")
      .select(col("expected"), LangId.langId(col("text")).as("got"))
      .collect()
    got.foreach(r => assert(r.getString(1) == r.getString(0),
      s"expected ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("empty / numeric / null handling") {
    val df = Seq(Some(""), Some("12345 678"), None).toDF("text")
      .select(LangId.langId(col("text")).as("l"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "und")
    assert(rows(1).getString(0) == "und")
    assert(rows(2).isNullAt(0))
  }
}
