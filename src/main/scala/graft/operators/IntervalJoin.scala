package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized interval (range) join: left rows carry a point, right rows
  * carry an [lo, hi] interval; emit every pair with `lo <= point <= hi`
  * (plus optional equi-keys).
  *
  * Spark executes a raw `p BETWEEN lo AND hi` theta join as a broadcast
  * nested loop — O(|L|·|R|) and a driver OOM once neither side
  * broadcasts. The standard distributed fix, used here: quantize the
  * domain into fixed-width buckets, explode each interval to the buckets
  * it overlaps (bounded by span/width + 1 copies), and equi-join on
  * (keys…, bucket) with the exact range predicate as a post-filter. One
  * hash shuffle on both sides; each (left, right) pair meets in exactly
  * one bucket (the point's), so no dedup pass is needed.
  *
  * Pick `bucketWidth` ≈ the typical interval span: wider wastes
  * candidates, narrower multiplies right-side copies. At 100 TB both
  * sides stay fully distributed — no broadcast, no driver involvement.
  */
object IntervalJoin {

  def pointInInterval(
      left: DataFrame, right: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) -- keyCols
    require(overlap.isEmpty,
      s"non-key columns ${overlap.mkString(",")} appear on both sides; rename one")

    def bucketOf(c: Column): Column = floor(c / bucketWidth.toDouble).cast("long")
    val l = left.withColumn("__bucket", bucketOf(col(pointCol)))
    val r = right.withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    l.join(r, keyCols :+ "__bucket")
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
