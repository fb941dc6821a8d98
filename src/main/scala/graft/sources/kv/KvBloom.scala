package graft.sources.kv

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, xxhash64}
import org.apache.spark.sql.sources._
import graft.functions.BloomFilterSketch
import graft.sources.ParquetIO

/** Per-FILE Bloom filters for kv point lookups — the complement of the
  * zone-map search index ([[KvIndex]]): zone maps prune by min/max, so
  * on an UNCLUSTERED column (every file's range spans the whole domain)
  * they prune nothing, while a Bloom filter answers "this file
  * definitely does not contain value v" regardless of layout. With the
  * sidecar present, `EqualTo`/`In` predicates on bloomed columns drop
  * whole files at PLANNING time — the point-lookup path over a 100 TB
  * unsorted table touches only the files that might hold the key,
  * without rewriting the table into a clustered layout.
  *
  * Safety is the [[KvIndex]] contract: pruning is three-valued and
  * conservative (files without an entry are never pruned, non-equality
  * predicates never consult the filter), false negatives are impossible
  * by construction, and false positives only cost a scan that the
  * record-level predicate then empties. Maintenance rewrites
  * (`KvMerge.writeAndSwap`) replace the table directory wholesale, so a
  * stale sidecar cannot survive a rewrite.
  *
  * Hashing: `xxhash64(col)` (Spark's codegen'd built-in, seed 42) on
  * the build side, replayed value-side at probe time via
  * `XxHash64Function` — then [[BloomFilterSketch]]'s splitmix double
  * hashing for probe positions. One deterministic chain, no per-row UDF.
  *
  * Build cost: one column scan per file (driver-sequenced Spark jobs —
  * at cluster scale this runs per table-partition in the same
  * maintenance window as compaction/bucketize).
  */
object KvBloom {

  case class ColBloom(bits: Array[Byte], numBits: Int, numHashes: Int) {
    def mightContain(hash: Long): Boolean =
      BloomFilterSketch.probeHit(bits, hash, numBits, numHashes)
  }

  /** file path → column → bloom. */
  type BloomMap = Map[String, Map[String, ColBloom]]

  private def indexFile(tablePath: String) = new Path(tablePath, "_index/bloom.json")

  /** Build (or rebuild) per-file Bloom filters for `cols` in ONE
    * distributed pass: the scan's `_file` metadata column groups rows by
    * their physical file, and one `groupBy(_file)` aggregates every
    * file's bitsets together — no per-file driver loop, the shape that
    * holds at a million files. Filter width is sized from the LARGEST
    * file's row count (one width per table keeps the single-pass
    * aggregation; small files just get a sparser filter). Files absent
    * from the grouped output hold zero rows and get an all-zero filter
    * (they contain nothing — prune everything).
    * `bitsPerKey` ≈ 10 gives ~1% false positives with 7 probes.
    */
  def build(spark: SparkSession, tablePath: String, cols: Seq[String],
      bitsPerKey: Int = 10): Unit = {
    require(cols.nonEmpty, "bloom build needs at least one column")
    require(bitsPerKey >= 1 && bitsPerKey <= 64, s"bitsPerKey out of range: $bitsPerKey")
    val numHashes = math.max(1, math.round(bitsPerKey * 0.693).toInt)
    val files = ParquetIO.listFilesStatus(tablePath)
    if (files.isEmpty) { writeJson(tablePath, Map.empty); return }
    val maxRows = files.map { case (f, len, mtime) =>
      ParquetIO.footerInfoCached(f, len, mtime).map(_.rowCount).sum
    }.max
    val numBits = math.max(64L, (maxRows * bitsPerKey + 63) / 64 * 64)
    require(numBits <= Int.MaxValue,
      s"bloom width $numBits exceeds Int range — lower bitsPerKey or split files")
    val df = spark.read.format("kv").option("path", tablePath).load()
    val aggs = cols.map { c =>
      BloomFilterSketch.bloomAgg(xxhash64(col(c)), numBits.toInt, numHashes).as(c)
    }
    val grouped = df.select(col("_file") +: cols.map(col): _*)
      .groupBy(col("_file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        r.getString(0) -> cols.zipWithIndex.map { case (c, i) =>
          c -> ColBloom(r.getAs[Array[Byte]](i + 1), numBits.toInt, numHashes)
        }.toMap
      }.toMap
    val emptyBloom = ColBloom(new Array[Byte](numBits.toInt / 8), numBits.toInt, numHashes)
    val empties = files.map(_._1.toString).filterNot(grouped.contains)
      .map(f => f -> cols.map(_ -> emptyBloom).toMap).toMap
    writeJson(tablePath, grouped ++ empties)
  }

  /** The persisted bloom map, or empty when absent/unreadable. */
  def bloomMap(tablePath: String): BloomMap =
    scala.util.Try(readJson(tablePath)).toOption.flatten.getOrElse(Map.empty)

  /** Probe-side hash: replay `xxhash64(value)` for an external filter
    * value. None for types the build side doesn't hash (no pruning).
    */
  def valueHash(v: Any): Option[Long] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64Function}
    v match {
      case null => None
      case _: Long | _: Int | _: Short | _: Byte | _: Double | _: Float |
           _: String | _: Boolean =>
        scala.util.Try {
          val lit = Literal(v)
          XxHash64Function.hash(lit.value, lit.dataType, 42L)
        }.toOption
      case _ => None
    }
  }

  /** Three-valued "may this file match the filter?" — false ONLY when
    * the Bloom filters PROVE no row matches (equality/IN on a bloomed
    * column whose every candidate value is definitely absent).
    */
  def mayMatch(f: Filter, blooms: Map[String, ColBloom]): Boolean = {
    def hit(c: String, v: Any): Boolean = blooms.get(c) match {
      case Some(b) => valueHash(v).forall(b.mightContain)
      case None => true
    }
    f match {
      case And(l, r) => mayMatch(l, blooms) && mayMatch(r, blooms)
      case Or(l, r) => mayMatch(l, blooms) || mayMatch(r, blooms)
      case EqualTo(c, v) => hit(c, v)
      case EqualNullSafe(c, v) if v != null => hit(c, v)
      case In(c, vs) => vs.isEmpty || vs.exists(v => v == null || hit(c, v))
      case _ => true // ranges/null-tests/unknown: the bloom says nothing
    }
  }

  // ---- persistence (json4s, the KvIndex pattern) ----

  private def writeJson(tablePath: String, bm: BloomMap): Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val files: org.json4s.JValue = bm.map { case (f, byCol) =>
      f -> byCol.map { case (c, b) =>
        c -> (("bits" -> java.util.Base64.getEncoder.encodeToString(b.bits)) ~
          ("numBits" -> b.numBits) ~ ("numHashes" -> b.numHashes))
      }
    }
    val p = indexFile(tablePath)
    val fs = p.getFileSystem(ParquetIO.hadoopConf)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(JsonMethods.compact(JsonMethods.render("files" -> files))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readJson(tablePath: String): Option[BloomMap] = {
    val p = indexFile(tablePath)
    val fs = p.getFileSystem(ParquetIO.hadoopConf)
    if (!fs.exists(p)) return None
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val in = fs.open(p)
    val root = try JsonMethods.parse(new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)) finally in.close()
    implicit val fmts: Formats = DefaultFormats
    root \ "files" match {
      case JObject(fields) => Some(fields.map { case (file, byCol) =>
        file -> (byCol match {
          case JObject(cs) => cs.map { case (c, j) =>
            c -> ColBloom(
              java.util.Base64.getDecoder.decode((j \ "bits").extract[String]),
              (j \ "numBits").extract[Int], (j \ "numHashes").extract[Int])
          }.toMap
          case _ => Map.empty[String, ColBloom]
        })
      }.toMap)
      case _ => None
    }
  }
}
