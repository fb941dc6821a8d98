package graft.sources.kv

import org.apache.hadoop.fs.Path
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.sources.ParquetIO

/** Column-evolution ledger for kv tables — the name-mapping half of
  * schema evolution (`_meta/evolution.json`).
  *
  * kv files are plain parquet and columns resolve BY NAME, so DROP and
  * RENAME cannot touch data files (the reference's wide-column stores
  * evolve the same way — attribute bytes are immutable once written,
  * e.g. Tablestore's schema-on-read contract,
  * `TableStoreRelation.scala:290-361`). This ledger records what the
  * names mean instead:
  *
  *  - `renames`: logical name → the PHYSICAL name under which files
  *    written before the rename store the column (Iceberg's
  *    column-mapping "name mode", collapsed over chains so every value
  *    is an original on-disk name). The row reader resolves a requested
  *    column through this map per file; files written after the rename
  *    carry the logical name directly and never consult it.
  *  - `dropped`: names (lowercased) whose bytes still exist in old
  *    files but must never resurface. ADD COLUMN refuses these names —
  *    a name-based store would otherwise resurrect the dropped values
  *    into the "new" column (the exact hazard Iceberg's field IDs
  *    exist to prevent; without IDs, refusal is the honest contract).
  *    Physical names of renamed columns are reserved the same way.
  *
  * Unlike the best-effort schema sidecar, this file IS correctness
  * (a lost rename mapping silently nulls a column on old files), so
  * DDL writes fail loudly and reads treat a present-but-unreadable
  * ledger as an error rather than degrading.
  */
object KvEvolution {

  case class Ledger(dropped: Set[String], renames: Map[String, String]) {
    /** Names no new column may take: dropped names plus the physical
      * names still owned by renamed columns (all lowercased).
      */
    def reserved: Set[String] = dropped ++ renames.values.map(_.toLowerCase)
    def isEmpty: Boolean = dropped.isEmpty && renames.isEmpty
  }
  val empty: Ledger = Ledger(Set.empty, Map.empty)

  private def ledgerFile(tablePath: String) =
    new Path(tablePath, "_meta/evolution.json")

  def read(tablePath: String): Ledger = {
    val p = ledgerFile(tablePath)
    val fs = p.getFileSystem(ParquetIO.hadoopConf)
    if (!fs.exists(p)) empty
    else {
      val in = fs.open(p)
      val json = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val j = JsonMethods.parse(json)
      val dropped = (j \ "dropped") match {
        case JArray(xs) => xs.collect { case JString(s) => s }.toSet
        case _ => Set.empty[String]
      }
      val renames = (j \ "renames") match {
        case JObject(fs0) => fs0.collect { case (k, JString(v)) => k -> v }.toMap
        case _ => Map.empty[String, String]
      }
      Ledger(dropped, renames)
    }
  }

  def write(tablePath: String, ledger: Ledger): Unit = {
    val p = ledgerFile(tablePath)
    val fs = p.getFileSystem(ParquetIO.hadoopConf)
    fs.mkdirs(p.getParent)
    val body = JsonMethods.compact(JsonMethods.render(JObject(
      "dropped" -> JArray(ledger.dropped.toList.sorted.map(JString(_))),
      "renames" -> JObject(ledger.renames.toList.sortBy(_._1)
        .map { case (k, v) => k -> (JString(v): JValue) }))))
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    require(fs.rename(tmp, p), s"could not publish evolution ledger at $p")
  }
}
