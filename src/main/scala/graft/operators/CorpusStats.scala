package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.KmvDistinct.kmvDistinct

/** ANALYZE-style table statistics in one pass: per-column null count,
  * min/max (orderable types), and approximate NDV via the KMV sketch —
  * the inputs a cost-based planner (or a 100 TB pipeline operator
  * choosing broadcast vs shuffle, or bands vs exact dedup) needs.
  *
  * Single aggregation job: every statistic is a partial-aggregable
  * expression, so the pass is one scan + one 1-row shuffle regardless of
  * table size. Output: one row per column
  * (column, n_rows, n_nulls, approx_ndv, min_str, max_str).
  */
object CorpusStats {

  def collect(df: DataFrame, kmvK: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.schema.fields
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { f =>
      val c = col(f.name)
      val orderable = f.dataType match {
        case _: ArrayType | _: MapType | _: StructType | BinaryType => false
        case _ => true
      }
      Seq(
        sum(c.isNull.cast("long")).as(s"${f.name}__nulls"),
        kmvDistinct(c, kmvK).as(s"${f.name}__ndv")) ++
        (if (orderable) Seq(
          min(c).cast("string").as(s"${f.name}__min"),
          max(c).cast("string").as(s"${f.name}__max"))
        else Seq(lit(null).cast("string").as(s"${f.name}__min"),
          lit(null).cast("string").as(s"${f.name}__max")))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("__n")
    val out = cols.map { f =>
      (f.name, n, row.getAs[Long](s"${f.name}__nulls"),
        row.getAs[Long](s"${f.name}__ndv"),
        Option(row.getAs[String](s"${f.name}__min")).orNull,
        Option(row.getAs[String](s"${f.name}__max")).orNull)
    }.toSeq
    out.toDF("column", "n_rows", "n_nulls", "approx_ndv", "min_str", "max_str")
  }

  /** Exact per-group quantiles over a BINNED value (`round(value,
    * binDecimals)`), with the standard `pos = p·(n−1)` linear
    * interpolation between the straddling order statistics.
    *
    * The scale-sane exact-quantile shape: one hash aggregation to
    * (group, bin) counts — map-side combinable, so the shuffle carries at
    * most |bins| rows per group per partition — then a window over the
    * DISTINCT bins only (bounded by the value range × 10^binDecimals, NOT
    * by corpus size) to get cumulative ranks, and a broadcast join of the
    * tiny (group × quantile) target-rank table back onto the bin ranks.
    * Binning makes the histogram finite; for data already at
    * `binDecimals` precision (money, metrics) the result is the exact
    * quantile. Every arithmetic step is replayed verbatim by the DuckDB
    * oracle — no reliance on engine quantile implementations agreeing.
    *
    * Returns one row per group: (group, n, q_<p> ...) with `p` spelled
    * without the leading "0." (q_25, q_50, q_99).
    */
  def binnedQuantiles(
      df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double], binDecimals: Int = 2): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    val g = col(groupCol)
    val bin = round(col(valueCol), binDecimals)
    val cnts = df.select(g, bin.as("b")).groupBy(g, col("b"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g).orderBy(col("b"))
    // rank interval covered by each bin: [cum - cnt + 1, cum]
    val ranked = cnts.withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("first_rank", col("cum") - col("cnt") + 1L)
    val totals = cnts.groupBy(g).agg(sum(col("cnt")).as("n"))
    val targets = totals
      .select(g, col("n"), explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("pos", col("p") * (col("n") - 1L).cast("double"))
      .withColumn("rlo", floor(col("pos")).cast("long") + 1L)
      .withColumn("rhi", ceil(col("pos")).cast("long") + 1L)
      .withColumn("frac", col("pos") - floor(col("pos")))
    // each target rank lands in exactly one bin's rank interval
    def lookup(rank: Column, as: String): DataFrame =
      broadcast(targets).join(ranked, Seq(groupCol))
        .where(rank >= col("first_rank") && rank <= col("cum"))
        .select(g, col("p"), col("n"), col("frac"), col("b").as(as))
    val joined = lookup(col("rlo"), "vlo")
      .join(lookup(col("rhi"), "vhi"), Seq(groupCol, "p", "n", "frac"))
      .withColumn("q", col("vlo") + (col("vhi") - col("vlo")) * col("frac"))
    def pName(p: Double): String =
      "q_" + BigDecimal(p).bigDecimal.stripTrailingZeros.toPlainString
        .stripPrefix("0.").replace(".", "_")
    joined.groupBy(g)
      .agg(max(col("n")).as("n"),
        ps.map(p => max(when(col("p") === p, col("q"))).as(pName(p))): _*)
  }
}
