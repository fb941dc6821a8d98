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

  /** Tagged union of both sides: left rows carry a null `__rstruct`,
    * right rows carry `struct(timeCol, rightVals*)` (the time rides along
    * so [[asofNearest]] can compare distances; equal-time ties still
    * resolve by the value fields, since the time field is equal inside a
    * tie). Returns (union, leftCols).
    */
  private def taggedUnion(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String,
      rightVals: Seq[String]): (DataFrame, Seq[String]) = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(c => rightVals.contains(c)),
      s"right value columns ${rightVals.mkString(",")} must not collide with left columns")

    val r = right.select((Seq(keyCol, timeCol) ++ rightVals).map(col): _*)
    val payload = timeCol +: rightVals

    // side 0 = right, 1 = left: right rows at time t sort before left rows
    // at t, so an equal-time right row IS visible to the left row.
    val taggedLeft = left
      .withColumn("__side", lit(1))
      .withColumn("__rstruct", lit(null).cast(
        r.select(struct(payload.map(col): _*)).schema.fields.head.dataType))
    val taggedRight = r
      .select(Seq(col(keyCol), col(timeCol)) :+ lit(0).as("__side") :+
        struct(payload.map(col): _*).as("__rstruct"): _*)
      .withColumns(leftCols.filterNot(Seq(keyCol, timeCol).contains)
        .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)

    (taggedLeft.select(
      (leftCols.map(col) :+ col("__side") :+ col("__rstruct")): _*)
      .unionByName(taggedRight.select(
        (leftCols.map(col) :+ col("__side") :+ col("__rstruct")): _*)),
      leftCols)
  }

  /** Backward window: running "last right row at-or-before me".
    * `__rstruct` last in the sort: equal-time right rows rank ascending
    * by value struct, so `last` resolves ties to the max tuple.
    */
  private def backwardMatch(keyCol: String, timeCol: String): Column = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"), col("__rstruct"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last(col("__rstruct"), ignoreNulls = true).over(w)
  }

  /** Forward window: time DESCENDS, so the running `last` at a left row
    * is the right row with the SMALLEST time at-or-after it. `__side`
    * still ascends (right before left) so an equal-time right row is
    * visible; equal-time right ties resolve to the max tuple exactly as
    * in the backward pass.
    */
  private def forwardMatch(keyCol: String, timeCol: String): Column = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).desc, col("__side"), col("__rstruct"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last(col("__rstruct"), ignoreNulls = true).over(w)
  }

  /** Null out a match farther than `tolerance` from the left row's time
    * (inclusive bound — pandas `merge_asof` tolerance semantics). The
    * distance is computed in the time column's native arithmetic, so
    * `tolerance` must be comparable to its differences: a long for
    * numeric time columns, an interval (`expr("INTERVAL '1' HOUR")`)
    * for timestamps. `when` without `otherwise` yields the null struct.
    */
  private def tolerated(matchCol: Column, dist: Column => Column,
      timeCol: String, tolerance: Option[Column]): Column =
    tolerance match {
      case None => matchCol
      case Some(t) => when(dist(col(s"__match.$timeCol")) <= t, col("__match"))
    }

  private def emit(unioned: DataFrame, leftCols: Seq[String],
      rightVals: Seq[String], matchCol: Column,
      dist: Column => Column, timeCol: String,
      tolerance: Option[Column]): DataFrame =
    unioned
      .withColumn("__match", matchCol)
      .withColumn("__match", tolerated(col("__match"), dist, timeCol, tolerance))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(v => col(s"__match.$v").as(v)): _*)

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
      rightVals: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {
    val (unioned, leftCols) = taggedUnion(left, right, keyCol, timeCol, rightVals)
    emit(unioned, leftCols, rightVals, backwardMatch(keyCol, timeCol),
      mt => col(timeCol) - mt, timeCol, tolerance)
  }

  /** Forward as-of: attach the EARLIEST right row with
    * `right.time >= left.time` (inclusive) — the "next quote/fill after
    * the order" lookup. Same single-Exchange shape as [[asofBackward]],
    * with the window sorted time-descending.
    */
  def asofForward(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String,
      rightVals: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {
    val (unioned, leftCols) = taggedUnion(left, right, keyCol, timeCol, rightVals)
    emit(unioned, leftCols, rightVals, forwardMatch(keyCol, timeCol),
      mt => mt - col(timeCol), timeCol, tolerance)
  }

  /** Nearest as-of: the closer of the backward and forward matches, ties
    * (equidistant) to the backward one — pandas `merge_asof
    * direction='nearest'` semantics, inclusive on both sides. Both window
    * passes share one hash partitioning (one Exchange, two in-partition
    * sorts); distance compares `left.time − b.time` against
    * `f.time − left.time` in the column's native arithmetic (longs
    * subtract to longs, timestamps to intervals — no double rounding).
    */
  def asofNearest(
      left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String,
      rightVals: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {
    val (unioned, leftCols) = taggedUnion(left, right, keyCol, timeCol, rightVals)
    val withBoth = unioned
      .withColumn("__mb", backwardMatch(keyCol, timeCol))
      .withColumn("__mf", forwardMatch(keyCol, timeCol))
    val lt = col(timeCol)
    val bt = col(s"__mb.$timeCol")
    val ft = col(s"__mf.$timeCol")
    val chosen = when(col("__mb").isNull, col("__mf"))
      .when(col("__mf").isNull, col("__mb"))
      .when(lt - bt <= ft - lt, col("__mb"))
      .otherwise(col("__mf"))
    withBoth
      .withColumn("__match", chosen)
      .withColumn("__match", tolerated(col("__match"),
        mt => greatest(lt - mt, mt - lt), timeCol, tolerance))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(v => col(s"__match.$v").as(v)): _*)
  }
}
