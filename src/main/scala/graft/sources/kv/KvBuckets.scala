package graft.sources.kv

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.ParquetIO

/** Hash-bucketed layout for a kv table — the storage-partitioned-join
  * (SPJ) surface: after [[graft.operators.KvMerge.bucketize]] every part
  * file holds exactly one bucket of `pmod(murmur3(cols), numBuckets)`,
  * the scan reports `KeyGroupedPartitioning(bucket(n, cols))`, and
  * Spark's v2 bucketing joins the table WITHOUT shuffling it: a
  * co-bucketed pair joins with zero exchanges, and any other plan
  * shuffles only the other side (`v2.bucketing.shuffle.enabled`), using
  * [[KvBucketFunction]] to route rows to the store's existing buckets.
  * This is the 100 TB incremental-ingest shape: the fingerprint store is
  * written once, clustered by `fp`, and every batch's anti-join
  * co-partitions on the store's layout instead of reshuffling the store
  * per batch.
  *
  * The bucket function REPLICATES Spark's own `HashPartitioning`
  * assignment (`pmod(Murmur3Hash(cols, seed=42), n)`), so the writer is
  * a plain `repartition(n, cols)` — partition `p` receives exactly the
  * rows whose bucket is `p`, no custom partitioner, no RDD drop-down —
  * and `BucketFunctionSpec` pins the replication against
  * `spark_partition_id()` on randomized data.
  *
  * Staleness follows [[KvClustering]]: the meta records the exact file
  * signature of the bucketized rewrite; any append or merge changes the
  * listing and the bucket claim silently disappears (correctness is
  * never at stake — only the shuffle elision).
  */
object KvBuckets {

  case class BucketMeta(cols: Seq[String], colTypes: Seq[DataType], numBuckets: Int,
      fileBuckets: Map[String, Int])

  private def metaFile(tablePath: String) = new Path(tablePath, "_meta/buckets.json")

  private def signature(tablePath: String): Seq[(String, Long, Long)] =
    ParquetIO.listFilesStatus(tablePath)
      .map { case (f, len, mt) => (f.getName, len, mt) }.sortBy(_._1)

  /** Best-effort like the clustering sidecar: a lost update only loses
    * the shuffle elision.
    *
    * `colTypes` records the DATA TYPE each bucket column had at
    * bucketize time: `Murmur3HashFunction.hash` is type-sensitive (an
    * INT hashes 4 bytes, a BIGINT 8 — `hash(5: INT) != hash(5L)`), so a
    * layout placed at one type is WRONG under another. [[bucketsFor]]
    * withdraws the claim on any mismatch with the live schema — the
    * guard against `ALTER COLUMN` type widening silently poisoning a
    * storage-partitioned join.
    */
  def record(tablePath: String, cols: Seq[String], colTypes: Seq[DataType],
      numBuckets: Int, fileBuckets: Map[String, Int]): Unit =
    scala.util.Try(recordUnsafe(tablePath, cols, colTypes, numBuckets, fileBuckets))
      .getOrElse(())

  private def recordUnsafe(tablePath: String, cols: Seq[String], colTypes: Seq[DataType],
      numBuckets: Int, fileBuckets: Map[String, Int]): Unit = {
    val p = metaFile(tablePath)
    val fs = p.getFileSystem(ParquetIO.hadoopConf)
    if (cols.isEmpty) { if (fs.exists(p)) fs.delete(p, false); return }
    require(colTypes.length == cols.length,
      s"bucket meta: ${cols.length} columns but ${colTypes.length} types")
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val doc =
      ("bucketBy" -> cols) ~
      ("bucketTypes" -> colTypes.map(_.catalogString)) ~
      ("numBuckets" -> numBuckets) ~
      ("files" -> signature(tablePath).map { case (n, len, mt) =>
        ("name" -> n) ~ ("len" -> len) ~ ("mtime" -> mt) ~
          ("bucket" -> fileBuckets.getOrElse(n, -1))
      })
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(JsonMethods.compact(JsonMethods.render(doc))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) { fs.delete(tmp, false); throw new java.io.IOException(
      s"rename $tmp -> $p failed recording bucket meta") }
  }

  /** Bucket meta iff the recorded file set matches the live listing and
    * every live file has a recorded bucket. Any failure degrades to None.
    */
  def bucketsFor(tablePath: String): Option[BucketMeta] =
    scala.util.Try(bucketsForUnsafe(tablePath)).toOption.flatten

  private def bucketsForUnsafe(tablePath: String): Option[BucketMeta] = {
    val p = metaFile(tablePath)
    val fs = p.getFileSystem(ParquetIO.hadoopConf)
    if (!fs.exists(p)) return None
    val json = {
      val in = fs.open(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(json) match {
      case JObject(fields) =>
        val m = fields.toMap
        val cols = m.get("bucketBy") match {
          case Some(JArray(vs)) => vs.collect { case JString(s) => s }
          case _ => return None
        }
        // no recorded types (pre-widening-guard meta) => withdraw the
        // claim: we cannot prove the layout's hash domain matches
        val colTypes = m.get("bucketTypes") match {
          case Some(JArray(vs)) if vs.length == cols.length =>
            vs.map {
              case JString(s) => CatalystSqlParser.parseDataType(s)
              case _ => return None
            }
          case _ => return None
        }
        val n = m.get("numBuckets") match {
          case Some(JInt(i)) => i.toInt
          case _ => return None
        }
        val recorded = m.get("files") match {
          case Some(JArray(fs0)) => fs0.collect {
            case JObject(ff) =>
              val fm = ff.toMap
              (fm.get("name"), fm.get("len"), fm.get("mtime"), fm.get("bucket")) match {
                case (Some(JString(nm)), Some(JInt(l)), Some(JInt(t)), Some(JInt(b))) =>
                  ((nm, l.toLong, t.toLong), b.toInt)
                case _ => return None
              }
          }
          case _ => return None
        }
        val live = signature(tablePath)
        if (recorded.map(_._1).sortBy(_._1) == live &&
            recorded.forall { case (_, b) => b >= 0 && b < n })
          Some(BucketMeta(cols, colTypes, n,
            recorded.map { case ((nm, _, _), b) => nm -> b }.toMap))
        else None
      case _ => None
    }
  }

  /** Spark's HashPartitioning assignment for one row of `cols`:
    * `pmod(Murmur3Hash(cols, seed = 42), n)` — the chained murmur over
    * the column values exactly as Catalyst computes it, so a
    * `repartition(n, cols)` writer and this function agree row for row.
    */
  def bucketOf(values: Seq[Any], types: Seq[DataType], n: Int): Int = {
    var hash = 42L
    var i = 0
    while (i < values.length) {
      hash = hashValue(values(i), types(i), hash)
      i += 1
    }
    val h = hash.toInt
    ((h % n) + n) % n
  }

  private def hashValue(v: Any, dt: DataType, seed: Long): Long = {
    import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
    if (v == null) seed // Murmur3Hash skips nulls (seed unchanged)
    else Murmur3HashFunction.hash(v, dt, seed) // the interpreted Murmur3Hash itself
  }

  val supportedTypes: Set[DataType] = Set(LongType, IntegerType, ShortType,
    ByteType, DateType, TimestampType, TimestampNTZType, StringType)
}

/** The `bucket(n, cols…)` v2 function [[KvCatalog]] serves so Catalyst
  * can resolve the scan's reported `KeyGroupedPartitioning` transform
  * and — under `v2.bucketing.shuffle.enabled` — shuffle the OTHER join
  * side to the store's layout by evaluating it.
  */
object KvBucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, cols...): pmod(murmur3(cols, 42), numBuckets) — " +
      "Spark's HashPartitioning assignment, the kv bucketized-layout key"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length >= 2,
      s"bucket() needs (numBuckets, col, ...), got ${inputType.simpleString}")
    require(inputType.head.dataType == IntegerType,
      s"bucket() first argument must be INT numBuckets, got ${inputType.head.dataType}")
    val colTypes = inputType.fields.drop(1).map(_.dataType).toSeq
    colTypes.foreach(t => require(KvBuckets.supportedTypes.contains(t),
      s"bucket() unsupported column type $t"))
    KvBucketBound(colTypes)
  }
}

case class KvBucketBound(colTypes: Seq[DataType]) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = (IntegerType +: colTypes).toArray
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.kv.bucket"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val values = colTypes.zipWithIndex.map { case (t, i) =>
      if (input.isNullAt(i + 1)) null else input.get(i + 1, t)
    }
    KvBuckets.bucketOf(values, colTypes, n)
  }
}
