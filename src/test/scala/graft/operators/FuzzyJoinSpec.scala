package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  private def brute(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      dist = lev(sa, sb) if dist <= d
    } yield (ia, ib, dist)).toSet

  private def run(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] = {
    val df = rows.toDF("id", "s")
    FuzzyJoin.editDistanceJoin(df, df, "id", "s", "id", "s", d)
      .where($"lid" < $"rid")
      .as[(Long, Long, Int)].collect().toSet
  }

  test("randomized: blocked join equals brute force for d = 0, 1, 2") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    val rows = (0L until 80L).map { i =>
      val n = rnd.nextInt(11)
      (i, Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    for (d <- 0 to 2) {
      val want = brute(rows, d)
      val got = run(rows, d)
      assert(got == want,
        s"d=$d missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("handles empty strings, exact dups, and cross-table joins") {
    val l = Seq((1L, ""), (2L, "ab"), (3L, "abc")).toDF("id", "s")
    val r = Seq((10L, "a"), (11L, "abc"), (12L, "xyz")).toDF("id", "s")
    val got = FuzzyJoin.editDistanceJoin(l, r, "id", "s", "id", "s", 1)
      .as[(Long, Long, Int)].collect().toSet
    val want = for {
      (ia, sa) <- Seq((1L, ""), (2L, "ab"), (3L, "abc"))
      (ib, sb) <- Seq((10L, "a"), (11L, "abc"), (12L, "xyz"))
      dist = lev(sa, sb) if dist <= 1
    } yield (ia, ib, dist)
    assert(got == want.toSet)
  }

  test("d=0 degenerates to exact string equality") {
    val rows = Seq((1L, "same"), (2L, "same"), (3L, "off"))
    assert(run(rows, 0) == Set((1L, 2L, 0)))
  }
}
