package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join helpers (SURVEY.md §7 north-star: "salting for
  * skew" alongside AQE's runtime skew-join splitting).
  *
  * `saltedInnerJoin` spreads a hot key across `saltFactor` shuffle
  * partitions: the big side gets a deterministic per-row salt, the small
  * side is replicated once per salt value. Results are identical to the
  * plain inner join; the shuffle for a key with N rows lands on
  * `saltFactor` reducers instead of one. Use when AQE's post-shuffle
  * splitting isn't enough (e.g. a single key larger than an executor).
  */
object SkewJoin {

  def saltedInnerJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val saltCol = "__graft_salt"
    // deterministic per-row salt (hash of the whole row) — reproducible
    // under task retry, unlike rand()
    val bigSalted = big.withColumn(saltCol,
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(saltFactor)).cast("int"))
    val saltValues = explode(sequence(lit(0), lit(saltFactor - 1)))
    val smallSalted = small.withColumn(saltCol, saltValues)
    bigSalted.join(smallSalted, keys :+ saltCol)
      .drop(saltCol)
  }
}
