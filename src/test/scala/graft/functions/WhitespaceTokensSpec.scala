package graft.functions

import scala.util.Random
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WhitespaceTokens must be bit-identical to `split(trim(c), "\\s+")` —
  * including the leading-empty-token, all-space, and multibyte edges —
  * since every token/shingle oracle replays that exact semantics.
  */
class WhitespaceTokensSpec extends SparkSpec {
  import spark.implicits._

  private def compare(inputs: Seq[String]): Unit = {
    val df = inputs.toDF("s").select(
      WhitespaceTokens.wsTokens(col("s")).as("fast"),
      split(trim(col("s")), "\\s+").as("ref"))
    val bad = df.filter(not(col("fast") <=> col("ref"))).collect()
    assert(bad.isEmpty, s"mismatch on: ${bad.take(3).mkString("; ")}")
  }

  test("edge cases match the regex split exactly") {
    compare(Seq(
      "", " ", "   ", "a", " a ", "a b", "a  b", "\ta", "a\t", "\t",
      "\n\na\r\nb\n", " \t a \n b \f c  ", "één twee\tdrie",
      "多词 文本\t测试", "a b", // NBSP is NOT \s — stays one token
      "x" * 500, ("w " * 200).trim))
  }

  test("randomized strings match the regex split") {
    val rnd = new Random(42)
    val alphabet = "ab 12\t\n\r\fé漢 "
    val inputs = (0 until 300).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    compare(inputs)
  }
}
