package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenizerTrainingSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala replay: count adjacent pairs, argmax (count desc, pair
    * asc), greedy leftmost merge, repeat.
    */
  private def reference(docs: Seq[String], rounds: Int): Seq[(Int, String, String, Long)] = {
    var corpus = docs.map(_.split(" ", -1).toVector)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (rd <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      corpus.foreach { t =>
        t.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
          case _ =>
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((rd, l, r, c))
        corpus = corpus.map { t =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < t.size) {
            if (i + 1 < t.size && t(i) == l && t(i + 1) == r) { b += s"$l $r"; i += 2 }
            else { b += t(i); i += 1 }
          }
          b.result()
        }
      }
    }
    out.toSeq
  }

  test("trainMerges equals a scalar BPE replay, round for round") {
    val docs = Seq(
      "the quick brown fox jumps over the quick dog",
      "the quick brown cat sits on the brown mat",
      "a quick brown fox is a quick fox")
    val got = TokenizerTraining.trainMerges(docs.toDF("text"), "text", rounds = 5)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == reference(docs, 5), s"got=$got want=${reference(docs, 5)}")
    // later rounds merge previously-merged tokens (phrase growth)
    assert(got.exists { case (_, l, r, _) => l.contains(" ") || r.contains(" ") },
      s"no compound merge in $got")
  }

  test("merge pass is greedy leftmost non-overlapping") {
    val out = TokenizerTraining.encodeWithMerges(
      Seq("a a a", "a a a a").toDF("text"), "text", Seq(("a", "a")))
      .select("tokens").as[Seq[String]].collect().toSeq
    assert(out(0) == Seq("a a", "a"))
    assert(out(1) == Seq("a a", "a a"))
  }

  test("encodeWithMerges applies the learned table in order") {
    val docs = Seq("x y z x y", "x y x y z")
    val merges = TokenizerTraining.trainMerges(docs.toDF("text"), "text", rounds = 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
      .map(m => (m._2, m._3)).toSeq
    val enc = TokenizerTraining.encodeWithMerges(docs.toDF("text"), "text", merges)
      .select("tokens").as[Seq[String]].collect()
    // every doc shrank (merges fired) and no adjacent learned pair remains
    enc.foreach { t =>
      merges.headOption.foreach { case (l, r) =>
        t.sliding(2).foreach {
          case Seq(a, b) => assert(!(a == l && b == r), s"unmerged pair in $t")
          case _ =>
        }
      }
    }
  }
}
