package graft.sources.kv

import org.apache.hadoop.fs.Path
import graft.sources.ParquetIO

/** Clustering metadata for a kv table: after `KvMerge.rewrite(clusterBy
  * = ...)` every part file is range-partitioned and sorted by the
  * cluster columns, so the scan can REPORT that ordering to Catalyst
  * (`SupportsReportOrdering`) and downstream per-partition sorts
  * (sortWithinPartitions, sort-merge-join inputs after a co-located
  * exchange, sorted writes) are elided.
  *
  * Safety is by exact file-set match, not invalidation hooks: the meta
  * records the (name, len, mtime) signature of the clustered file set,
  * and ordering is claimed only while the live listing matches exactly —
  * any append, merge, or rewrite changes the listing and the claim
  * silently disappears. A missing or stale meta never affects
  * correctness, only the elision.
  */
object KvClustering {

  private def metaFile(tablePath: String) = new Path(tablePath, "_meta/clustering.json")

  private def signature(tablePath: String): Seq[(String, Long, Long)] =
    ParquetIO.listFilesStatus(tablePath)
      .map { case (f, len, mt) => (f.getName, len, mt) }.sortBy(_._1)

  /** BEST-EFFORT like the schema sidecar: a rename race or fs hiccup
    * must not fail the rewrite that records the clustering — a lost
    * update only loses the sort elision.
    */
  def record(tablePath: String, clusterBy: Seq[String]): Unit =
    scala.util.Try(recordUnsafe(tablePath, clusterBy)).getOrElse(())

  private def recordUnsafe(tablePath: String, clusterBy: Seq[String]): Unit = {
    val p = metaFile(tablePath)
    val fs = p.getFileSystem(ParquetIO.hadoopConf)
    if (clusterBy.isEmpty) { if (fs.exists(p)) fs.delete(p, false); return }
    // json4s-serialized (names escaped) and written temp+rename: a crash
    // mid-write or a concurrent reader must never observe a torn file —
    // the contract is that stale/bad meta only loses the elision
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val doc =
      ("clusterBy" -> clusterBy) ~
      ("files" -> signature(tablePath).map { case (n, len, mt) =>
        ("name" -> n) ~ ("len" -> len) ~ ("mtime" -> mt)
      })
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(JsonMethods.compact(JsonMethods.render(doc))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) { fs.delete(tmp, false); throw new java.io.IOException(
      s"rename $tmp -> $p failed recording clustering meta") }
  }

  /** Cluster columns iff the recorded file set matches the live listing.
    * Any read/parse failure (torn file, malformed JSON, concurrent
    * rewrite) degrades to Nil — the elision is lost, never correctness.
    */
  def orderingFor(tablePath: String): Seq[String] =
    scala.util.Try(orderingForUnsafe(tablePath)).getOrElse(Nil)

  private def orderingForUnsafe(tablePath: String): Seq[String] = {
    val p = metaFile(tablePath)
    val fs = p.getFileSystem(ParquetIO.hadoopConf)
    if (!fs.exists(p)) return Nil
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
        val cols = m.get("clusterBy") match {
          case Some(JArray(vs)) => vs.collect { case JString(s) => s }
          case _ => return Nil
        }
        val recorded = m.get("files") match {
          case Some(JArray(fs0)) => fs0.collect {
            case JObject(ff) =>
              val fm = ff.toMap
              (fm.get("name"), fm.get("len"), fm.get("mtime")) match {
                case (Some(JString(n)), Some(JInt(l)), Some(JInt(t))) =>
                  (n, l.toLong, t.toLong)
                case _ => return Nil
              }
          }
          case _ => return Nil
        }
        if (recorded.sortBy(_._1) == signature(tablePath)) cols else Nil
      case _ => Nil
    }
  }
}
