package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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
}
