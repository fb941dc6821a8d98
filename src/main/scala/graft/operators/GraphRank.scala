package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph importance for corpus curation — the crawl-prioritization
  * prior (PageRank; Page et al. 1999): pages linked from many important
  * pages are likely higher-value training data, and a harvest pipeline
  * ranks its frontier (or weighs its documents) by exactly this.
  *
  * INTEGER-EXACT formulation: ranks live in micro-units (start at
  * 1_000_000 per node) and every update is integer arithmetic —
  * per-edge contribution `r(u) div outdeg(u)` (integer division), the
  * damped update `(sum · dampingPct) div 100 + (100 − dampingPct) · 10_000`.
  * Summation of integers is order-free, so a fixed iteration count
  * yields bit-identical ranks on any engine and partitioning — no float
  * folds, no convergence tolerance, replayable in plain SQL. (Dangling
  * nodes keep the teleport term only; their outflow is dropped, the
  * standard simplification — document mass is a prior here, not a
  * probability measure.)
  *
  * Scale shape: out-degrees are one partial-aggregable groupBy; each
  * iteration is ONE join of the rank frame to the edge list on the
  * source key plus ONE partial-aggregable sum keyed by destination —
  * both co-keyed shuffles that bucketizing the edge list by src would
  * eliminate. Iterations are a fixed small count (frontier ranking uses
  * 2–5), so the plan is a short linear chain, not an unbounded loop.
  */
object GraphRank {

  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1 && iterations <= 16,
      s"iterations must be in [1, 16], got $iterations")
    require(dampingPct >= 1 && dampingPct <= 99,
      s"dampingPct must be in [1, 99], got $dampingPct")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val teleport = (100L - dampingPct) * 10000L

    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    (1 to iterations).foreach { _ =>
      val contrib = ranks.join(outdeg, ranks("id") === outdeg("src"))
        .join(e, "src")
        .select(col("dst").as("id"),
          expr("rank_micro DIV outdeg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("inflow"))
      ranks = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (expr(s"coalesce(inflow, CAST(0 AS BIGINT)) * $dampingPct DIV 100") +
            lit(teleport)).as("rank_micro"))
    }
    ranks
  }
}
