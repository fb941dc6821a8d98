package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) similarity join — the record-linkage /
  * fuzzy-dedup primitive: all pairs (l, r) with `ed(l, r) <= maxDist`.
  *
  * Method is segment blocking (the PassJoin family, Li et al. 2011,
  * "PassJoin: a partition-based method for similarity joins"): the right
  * side cuts each string into `maxDist + 1` contiguous segments — by
  * pigeonhole, any string within `maxDist` edits must contain at least
  * one segment VERBATIM, displaced by at most `maxDist` positions. The
  * left side therefore emits, per string, every substring that could be
  * such a segment (per target length ±maxDist and position shift
  * ±maxDist); an equi-join on (segment text, segment index, target
  * length) yields a complete candidate set, and the codegen'd built-in
  * `levenshtein` verifies exactly. No cartesian product anywhere — the
  * only corpus-sized shuffles are the two hash exchanges on the segment
  * key plus the candidate-pair dedup.
  *
  * Scale notes: probe fan-out is bounded by (maxDist+1)·(2·maxDist+1)²
  * keys per row (27 at d=1, 125 at d=2) — row-local arithmetic, no
  * driver involvement. Corpora with a shared long prefix (ids, URLs)
  * concentrate one segment key; the verify join still bounds work to
  * |candidates|·O(len²), and AQE's skew split handles the hot key — the
  * same stance as the salted-join operator for genuinely adversarial
  * skew.
  */
object FuzzyJoin {

  /** Segment (start, len) pairs for the d+1 even segments of a string of
    * length L: first (L mod (d+1)) segments get an extra char.
    */
  private def segments(len: Column, d: Int): Column = {
    val q = (len / (d + 1)).cast("int")
    val r = (len % (d + 1)).cast("int")
    transform(sequence(lit(0), lit(d)), i =>
      struct(
        (i * q + least(i, r)).as("start"),
        (q + when(i < r, 1).otherwise(0)).as("slen"),
        i.as("seg")))
  }

  /** All pairs (leftId, rightId, dist) with `levenshtein <= maxDist`,
    * excluding trivial self-pairs when both sides share the id space
    * (callers filter `lid < rid` for a self-join's unordered pairs).
    */
  def editDistanceJoin(
      left: DataFrame, right: DataFrame,
      leftIdCol: String, leftStrCol: String,
      rightIdCol: String, rightStrCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 4,
      s"maxDist must be in [0, 4] (probe fan-out grows cubically), got $maxDist")
    val d = maxDist

    // right: one row per segment, keyed (segment text, seg idx, own length)
    val r = right.select(col(rightIdCol).as("rid"), col(rightStrCol).as("rs"))
      .withColumn("rl", length(col("rs")).cast("int"))
      .select(col("rid"), col("rs"), col("rl"),
        explode(segments(col("rl"), d)).as("sg"))
      .select(col("rid"), col("rs"),
        col("rs").substr(col("sg.start") + 1, col("sg.slen")).as("key"),
        col("sg.seg").as("seg"), col("rl").as("tl"))

    // left: for each target length tl in [ll-d, ll+d] and each of the
    // SAME segments the right side cuts (shared `segments` helper — one
    // definition of the pigeonhole partition, so the two sides cannot
    // drift), every substring of the segment's length within ±d of its
    // position — the complete PassJoin probe set
    val l0 = left.select(col(leftIdCol).as("lid"), col(leftStrCol).as("ls"))
      .withColumn("ll", length(col("ls")).cast("int"))
    val probes = flatten(transform(
      sequence(col("ll") - d, col("ll") + d), tl =>
        flatten(transform(segments(tl, d), sg =>
          filter(
            transform(
              sequence(sg.getField("start") - d, sg.getField("start") + d), p =>
                when(tl >= 0 && p >= 0 && p + sg.getField("slen") <= col("ll"),
                  struct(col("ls").substr(p + 1, sg.getField("slen")).as("key"),
                    sg.getField("seg").as("seg"), tl.as("tl")))),
            x => x.isNotNull)))))
    val l = l0.select(col("lid"), col("ls"),
      explode(array_distinct(probes)).as("pr"))
      .select(col("lid"), col("ls"),
        col("pr.key").as("key"), col("pr.seg").as("seg"), col("pr.tl").as("tl"))

    l.join(r, Seq("key", "seg", "tl"))
      .select(col("lid"), col("rid"), col("ls"), col("rs"))
      .dropDuplicates("lid", "rid")
      .withColumn("dist", levenshtein(col("ls"), col("rs")))
      .where(col("dist") <= d)
      .select(col("lid"), col("rid"), col("dist"))
  }
}
