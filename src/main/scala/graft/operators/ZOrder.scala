package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional clustering key (Z-order / Morton curve) for kv
  * table maintenance — the layout that makes zone-map pruning work on
  * SEVERAL columns at once, where linear `clusterBy` only serves its
  * leading column.
  *
  * Delta Lake's `OPTIMIZE ... ZORDER BY` and Iceberg's
  * `rewrite_data_files(strategy => 'sort', sort_order => zorder(...))`
  * are the public prior art; both map each dimension to a bounded
  * integer rank and sort by the bit-interleave of the ranks. This
  * implementation keeps the whole chain declarative so Catalyst codegens
  * it end to end:
  *
  *   1. per column, equi-depth bucket boundaries (2^bits buckets) from
  *      one `percentile_approx` aggregation over a column-pruned scan —
  *      equi-depth (not min/max scaling) so skewed columns still spread
  *      across the curve;
  *   2. per row, bucket rank = count of boundaries strictly below the
  *      value (a codegen'd indicator sum — no UDF, no join);
  *   3. z = bitwise interleave of the ranks (shift/and/or built-ins),
  *      NULLs rank lowest (bucket 0, like NULLS FIRST).
  *
  * The z column exists only inside the rewrite: rows are
  * range-partitioned and sorted by it, then it is projected away before
  * the write. Correctness never depends on the curve — it only decides
  * FILE PLACEMENT; the zone-map/footer min/max pruning that exploits the
  * placement stays safety-gated by the scan ("uncovered is never
  * pruned", `KvSource.prunedGroups`).
  *
  * Scale: the boundary pass is one partial-aggregable sketch per column
  * (GK quantile summaries merge on the driver as ~KB objects); the
  * rewrite itself is `repartitionByRange` — Spark samples the z key, so
  * no reducer owns the table. At 100 TB this runs partition-by-partition
  * like every other maintenance op here.
  */
object ZOrder {

  /** Max bits per dimension: interleaved key must fit a long with room
    * for `dims * bits` bits.
    */
  private def checkDims(nCols: Int, bits: Int): Unit = {
    require(nCols >= 1, "zorderBy needs at least one column")
    require(bits >= 1 && nCols * bits <= 62,
      s"zorder: $nCols columns x $bits bits = ${nCols * bits} interleaved " +
        "bits must fit a long (<= 62)")
    // boundaries() materializes 2^bits - 1 interior cuts per column as an
    // Int count; past ~20 bits the cut list is far beyond
    // percentile_approx resolution anyway and `1 << bits` would wrap —
    // cap at a practical ceiling instead of silently coarsening
    require(bits <= 20,
      s"zorder: $bits bits per dimension exceeds the practical ceiling of " +
        "20 (2^bits boundary cuts per column)")
  }

  /** Equi-depth boundaries per column, (2^bits - 1) interior cuts:
    *   - numeric/date/timestamp → quantiles of the column cast to
    *     double (one `percentile_approx` aggregation; zone maps
    *     normalize the same way — `KvIndex.zonesFromStats`);
    *   - string → quantiles of a bounded deterministic hash-sample
    *     (`BoundedTopK` over splitmix64(xxhash64(value)) — the
    *     trainCentroids sampling discipline; duplicates stay in the
    *     sample, so heavy values still shape the cuts equi-depth).
    * Duplicate boundaries collapse (a heavy value spanning quantiles
    * costs curve resolution on that column, never correctness).
    */
  def boundaries(df: DataFrame, cols: Seq[String], bits: Int,
      maxStringSample: Int = 4096): Map[String, Seq[Any]] = {
    checkDims(cols.length, bits)
    import org.apache.spark.sql.types.StringType
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt == StringType || orderPreservingDouble(col(c), dt).isDefined,
        s"zorder column $c: unsupported type $dt (numeric, date, " +
          "timestamp and string columns)")
    }
    val n = 1 << bits
    val (strCols, numCols) =
      cols.partition(c => df.schema(c).dataType == StringType)
    val numBnds: Map[String, Seq[Any]] =
      if (numCols.isEmpty) Map.empty
      else {
        val pcts = array((1 until n).map(i => lit(i.toDouble / n)): _*)
        val aggs = numCols.map(c => percentile_approx(
          orderPreservingDouble(col(c), df.schema(c).dataType).get,
          pcts, lit(10000)).as(c))
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        numCols.zipWithIndex.map { case (c, i) =>
          val raw = row.getSeq[Double](i) match {
            case null => Array.empty[Double] // empty table: single bucket
            case s => s.toArray
          }
          c -> (raw.distinct.sorted.toSeq: Seq[Any])
        }.toMap
      }
    val strBnds: Map[String, Seq[Any]] = strCols.map { c =>
      // bounded global heap: ≤ maxStringSample rows shuffle, hash-desc
      // order is a uniform sample, value-asc ties keep it deterministic
      val sample = df.select(col(c)).na.drop()
        .select(graft.functions.Sketches.splitmixLong(xxhash64(col(c)))
          .cast("double").as("hk"), col(c).as("v"))
        .agg(graft.functions.BoundedTopK.topK(
          struct(col("hk"), col("v")), maxStringSample).as("top"))
        .select(explode(col("top.v")).as("v"))
        .collect().map(_.getString(0)).sorted
      val cuts =
        if (sample.isEmpty) Array.empty[String]
        else (1 until n).map(i => sample((i * sample.length / n)
          .min(sample.length - 1))).toArray
      c -> (cuts.distinct.sorted.toSeq: Seq[Any])
    }.toMap
    (numBnds ++ strBnds: Map[String, Seq[Any]])
  }

  /** Order-preserving cast to double, or None for unsupported types.
    * (Long→double loses exact order above 2^53 — acceptable for a
    * layout key: adjacent values collapsing into one bucket only costs
    * resolution.)
    */
  private def orderPreservingDouble(c: Column,
      dt: org.apache.spark.sql.types.DataType): Option[Column] = {
    import org.apache.spark.sql.types._
    dt match {
      case _: NumericType => Some(c.cast(DoubleType))
      case DateType => Some(c.cast(IntegerType).cast(DoubleType))
      case TimestampType | TimestampNTZType =>
        Some(c.cast(LongType).cast(DoubleType))
      case _ => None
    }
  }

  /** The interleaved z key as a single codegen'd Column. `bnds` comes
    * from [[boundaries]] over the same DataFrame (or any superset — a
    * stale boundary set only degrades placement).
    */
  def zColumn(df: DataFrame, cols: Seq[String],
      bnds: Map[String, Seq[Any]], bits: Int): Column = {
    checkDims(cols.length, bits)
    import org.apache.spark.sql.types.StringType
    val k = cols.length
    val ranks = cols.map { c =>
      val d =
        if (df.schema(c).dataType == StringType) col(c)
        else orderPreservingDouble(col(c), df.schema(c).dataType).getOrElse(
          throw new IllegalArgumentException(s"zorder column $c unsupported"))
      val bs = bnds.getOrElse(c, Seq.empty)
      // indicator sum = number of boundaries strictly below the value
      // (string comparisons are Spark's binary UTF8 order — the same
      // order parquet BINARY min/max stats use, so zone maps prune the
      // resulting layout); NULL comparisons are false under when(),
      // so NULL ranks 0
      if (bs.isEmpty) lit(0)
      else bs.foldLeft(lit(0)) { (acc, b) =>
        acc + when(d > lit(b), 1).otherwise(0)
      }
    }
    // z = OR over bit j of rank i shifted to position j*k + i
    val parts = for {
      j <- 0 until bits
      (r, i) <- ranks.zipWithIndex
    } yield shiftleft(shiftright(r, j).bitwiseAND(lit(1)).cast("long"),
      j * k + i)
    parts.reduce(_.bitwiseOR(_))
  }
}
