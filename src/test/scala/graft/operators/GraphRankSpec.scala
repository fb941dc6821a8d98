package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank matches a plain-Scala integer replay on a fixed graph") {
    // 0 ← {1,2,3,4}; 0 → 1; 4 also → 2  (mixed in/out degrees, a sink path)
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L), (4L, 2L))
      .toDF("src", "dst")
    val got = GraphRank.pageRank(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // independent replay
    val es = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L), (4L, 2L))
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val outdeg = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> 1000000L).toMap
    (1 to 3).foreach { _ =>
      val inflow = es.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / outdeg(u) }.sum).toMap
      r = nodes.map(v => v -> (inflow.getOrElse(v, 0L) * 85 / 100 + 150000L)).toMap
    }
    assert(got == r, s"got $got want $r")
    // the hub (0) outranks everything; leaf 3 has teleport-only rank
    assert(got(0L) == got.values.max)
    assert(got(3L) == 150000L)
  }

  test("pageRankBucketed over the SPJ edge layout equals the in-memory path") {
    val edges = (0L until 300L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 300), (i, (i * 31 + 1) % 300), (i, (i * 131 + 1) % 300)))
      .toDF("src", "dst")
    val path = java.nio.file.Files.createTempDirectory("prbuck").toString + "/edges"
    GraphRank.prepareEdgesBucketed(spark, edges, "src", "dst", path, numBuckets = 4)
    val plain = GraphRank.pageRank(edges, "src", "dst", iterations = 3)
      .orderBy("id").collect().map(_.toString).toSeq
    val bucketed = GraphRank.pageRankBucketed(spark, path, iterations = 3)
      .orderBy("id").collect().map(_.toString).toSeq
    assert(bucketed == plain)
  }

  test("rank is partitioning-invariant (integer sums are order-free)") {
    val edges = (0L until 200L).flatMap(i => Seq((i, (i * 7 + 1) % 200), (i, (i * 31 + 1) % 200)))
      .toDF("src", "dst")
    val a = GraphRank.pageRank(edges, "src", "dst", iterations = 2)
      .orderBy("id").collect().map(_.toString).toSeq
    val b = GraphRank.pageRank(edges.repartition(13), "src", "dst", iterations = 2)
      .orderBy("id").collect().map(_.toString).toSeq
    assert(a == b)
  }
}
