package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed merge-rule training — the BPE training loop (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") lifted to token level: each round counts all adjacent token
  * pairs across the corpus, takes the globally most frequent pair
  * (count desc, then lexicographic — a total order), and merges its
  * occurrences greedily left-to-right, non-overlapping, in every
  * document. Round t's counts see round t-1's merges, exactly like the
  * reference BPE trainer; the learned merge table IS the model
  * (word2phrase-style collocation discovery / tokenizer vocab growth).
  *
  * Scale shape: each round is ONE partial-aggregable groupBy over the
  * corpus pair stream plus a row-local merge pass; the only driver
  * traffic is the single winning (pair, count) row per round (the same
  * bounded per-round scalar as the connected-components convergence
  * check). The current tokenization persists between rounds so round t
  * does not replay rounds 1..t-1's merge passes.
  *
  * Determinism contract: pair counts are exact integers; the winner
  * order is (count desc, left asc, right asc); the merge is greedy
  * leftmost non-overlapping — equal to a leftmost global string
  * `replace`, which is how the oracle replays every round in SQL.
  */
object TokenizerTraining {

  /** One greedy leftmost non-overlapping merge pass of (l, r) → "l r"
    * over a token array — a linear fold with one token of lookbehind.
    */
  private[operators] def applyMerge(toks: Column, l: String, r: String): Column = {
    val init = struct(
      array().cast(ArrayType(StringType, containsNull = false)).as("out"),
      lit("").as("pend"), lit(false).as("has"))
    aggregate(toks, init,
      (acc, x) => {
        val isPair = acc.getField("has") &&
          acc.getField("pend") === lit(l) && x === lit(r)
        struct(
          when(isPair, concat(acc.getField("out"), array(lit(l + " " + r))))
            .otherwise(when(acc.getField("has"),
              concat(acc.getField("out"), array(acc.getField("pend"))))
              .otherwise(acc.getField("out"))).as("out"),
          when(isPair, lit("")).otherwise(x).as("pend"),
          not(isPair).as("has"))
      },
      acc => when(acc.getField("has"),
        concat(acc.getField("out"), array(acc.getField("pend"))))
        .otherwise(acc.getField("out")))
  }

  /** The same greedy merge as [[applyMerge]], as a LINEAR JVM pass for
    * the training hot loop: the Column fold's per-token array `concat`
    * copies the accumulated array every step — O(len²) per document,
    * and the dominant cost of a training round. Semantics are pinned
    * equal by the round-for-round trainer spec.
    */
  private def applyMergeRows(df: DataFrame, l: String, r: String): DataFrame = {
    val schema = df.schema
    val idx = schema.fieldIndex("__toks")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val merged = l + " " + r
    df.mapPartitions { rows =>
      rows.map { row =>
        val t = row.getSeq[String](idx)
        val n = t.length
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < n) {
          if (i + 1 < n && t(i) == l && t(i + 1) == r) { b += merged; i += 2 }
          else { b += t(i); i += 1 }
        }
        Row(b.toSeq)
      }
    }(enc)
  }

  /** Adjacent (l, r) pair stream of a token-array column. */
  private def pairStream(df: DataFrame): DataFrame = {
    val n = size(col("__toks"))
    df.select(explode(zip_with(
        slice(col("__toks"), lit(1), greatest(n - 1, lit(0))),
        slice(col("__toks"), lit(2), greatest(n - 1, lit(0))),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"))
  }

  /** Train `rounds` merge rules; returns (round, left, right, pair_count)
    * — the merge table, in learned order. Stops early if no adjacent
    * pair remains anywhere in the corpus.
    */
  def trainMerges(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds must be in [1, 64], got $rounds")
    val spark = df.sparkSession
    var cur = df.select(split(col(textCol), " ").as("__toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var parent: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      // this action materializes cur's cache, after which its parent's
      // cache is dead weight — no separate count() job needed. The
      // argmax rides the bounded-heap aggregate (count desc, l asc,
      // r asc — the exact tie rule) instead of a global sort + limit.
      val top = pairStream(cur)
        .groupBy(col("l"), col("r")).agg(count(lit(1)).as("c"))
        .agg(graft.functions.BoundedTopK.topK(
          struct(col("c").cast("double").as("c"), col("l"), col("r")), 1).as("t"))
        .select(col("t")(0).getField("l").as("l"), col("t")(0).getField("r").as("r"),
          col("t")(0).getField("c").cast("long").as("c"))
        .where(col("l").isNotNull)
        .collect()
      if (parent != null) { parent.unpersist(); parent = null }
      if (top.isEmpty) exhausted = true
      else {
        val w = top.head
        val (l, r, c) = (w.getString(0), w.getString(1), w.getLong(2))
        merges += ((round, l, r, c))
        if (round < rounds) { // the last round's merge is never counted
          parent = cur
          cur = applyMergeRows(cur, l, r)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        }
        round += 1
      }
    }
    if (parent != null) parent.unpersist()
    cur.unpersist()
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq.map {
        case (rd, l, r, c) => Row(rd, l, r, c) }, 1),
      StructType(Seq(
        StructField("round", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** Apply a learned merge table (in order) to a corpus — the encode
    * side of the trainer; row-local, zero shuffles.
    */
  def encodeWithMerges(
      df: DataFrame, textCol: String,
      merges: Seq[(String, String)], outCol: String = "tokens"): DataFrame = {
    val toks = merges.foldLeft(split(col(textCol), " ")) {
      case (acc, (l, r)) => applyMerge(acc, l, r)
    }
    df.withColumn(outCol, toks)
  }
}
