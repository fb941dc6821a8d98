package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for every left row, attach the most recent
  * right row of the same key with `right.time <= left.time` (backward
  * as-of, inclusive — the time-series point-in-time lookup Spark has no
  * native operator for).
  *
  * Implementation is the scale-correct single-shuffle shape, not a
  * per-key collect and not an O(|L|·|R|) theta join: tag both inputs,
  * union them, hash-partition by key, and run one window pass ordered by
  * (time, side) in which each left row picks up the running "last right
  * row seen" via `last(..., ignoreNulls)` over the unbounded-preceding
  * frame. Right rows sort before left rows at equal times, which makes
  * the match inclusive. One Exchange on the key, one per-key sort —
  * exactly what a 100 TB sort-merge join would pay, with perfect
  * parallelism across keys (a window never spans two keys).
  *
  * Ties inside the right table (two right rows with the same (key, time))
  * resolve to the MAX value tuple — for free, inside the same window
  * sort: equal-time right rows order ascending by their value struct, so
  * the running `last` sees the max one latest. No pre-aggregation, no
  * second shuffle, and the rule is replayable by any engine (an ASOF
  * JOIN oracle pre-aggregates `max(...)` per (key, time) to the same
  * effect).
  */
object AsOfJoin {

  /** @param left      left (probe) side
    * @param right     right (reference) side
    * @param keyCol    equi-key column name present in both inputs
    * @param timeCol   event-time column name present in both inputs
    * @param rightVals right-side value columns to attach (null when no
    *                  right row is at or before the left row's time)
    */
  def asofBackward(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(c => rightVals.contains(c)),
      s"right value columns ${rightVals.mkString(",")} must not collide with left columns")

    val r = right.select((Seq(keyCol, timeCol) ++ rightVals).map(col): _*)

    // side 0 = right, 1 = left: right rows at time t sort before left rows
    // at t, so an equal-time right row IS visible to the left row.
    val taggedLeft = left
      .withColumn("__side", lit(1))
      .withColumn("__rstruct", lit(null).cast(
        r.select(struct(rightVals.map(col): _*)).schema.fields.head.dataType))
    val taggedRight = r
      .select(Seq(col(keyCol), col(timeCol)) :+ lit(0).as("__side") :+
        struct(rightVals.map(col): _*).as("__rstruct"): _*)
      .withColumns(leftCols.filterNot(Seq(keyCol, timeCol).contains)
        .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)

    val unioned = taggedLeft.select(
      (leftCols.map(col) :+ col("__side") :+ col("__rstruct")): _*)
      .unionByName(taggedRight.select(
        (leftCols.map(col) :+ col("__side") :+ col("__rstruct")): _*))

    // __rstruct last in the sort: equal-time right rows rank ascending by
    // value struct, so `last` resolves ties to the max tuple.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"), col("__rstruct"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__rstruct"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(v => col(s"__match.$v").as(v)): _*)
  }
}
