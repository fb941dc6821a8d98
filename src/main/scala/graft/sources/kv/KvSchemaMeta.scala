package graft.sources.kv

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.{DataType, StructType}
import graft.sources.ParquetIO

/** Persisted table schema for schema-less kv reads — the reference's
  * persisted-schema inference variant (`RedisRelation.scala:253-306`)
  * re-expressed as a `_meta/schema.json` sidecar: every committed write
  * records the union of the written schema with what the sidecar already
  * holds, so a catalog-less reader sees EVERY attribute the table has
  * ever carried — including sparse attributes absent from the first (or
  * any given) part file, which first-file footer inference would lose.
  *
  * Safety mirrors KvClustering: writes are temp+rename atomic, reads are
  * Try-safe, and a missing/corrupt sidecar only degrades inference to
  * the footer union — never correctness.
  */
object KvSchemaMeta {

  private def metaFile(tablePath: String) = new Path(tablePath, "_meta/schema.json")

  /** Record `schema` (unioned with any existing sidecar, existing fields
    * keep their type on name conflict). Fields are normalized to
    * nullable: the wide-column model is sparse — any attribute can be
    * absent from any row/file — and a non-nullable field (e.g. from a
    * tuple-derived write schema) would both constant-fold `IS NULL`
    * predicates to false and make the vectorized reader reject files
    * lacking the column.
    *
    * BEST-EFFORT: the sidecar is an inference convenience, never
    * correctness — a concurrent-writer rename race or a filesystem
    * hiccup must not fail the surrounding write commit; a lost update
    * only degrades catalog-less reads to the footer union.
    */
  def record(tablePath: String, schema: StructType): Unit =
    scala.util.Try(recordUnsafe(tablePath, schema)).getOrElse(())

  private def recordUnsafe(tablePath: String, schema: StructType): Unit = {
    // names dropped or renamed away stay out of the recorded schema even
    // if a later append writes them: the evolution ledger owns those
    // names (old-file bytes would otherwise resurface through the union)
    val reserved = KvEvolution.read(tablePath).reserved
    val incoming = StructType(allNullable(schema).fields
      .filterNot(f => reserved.contains(f.name.toLowerCase)))
    writeSchema(tablePath, read(tablePath)
      .map(union(_, incoming)).getOrElse(incoming))
  }

  /** Replace the persisted schema WHOLESALE — the schema-evolution DDL
    * path (`ALTER COLUMN … TYPE`), where the new field type must WIN
    * over the recorded one; `record`'s first-wins union would keep the
    * old type forever. Unlike `record` this is not best-effort: DDL
    * must fail loudly when the sidecar can't be written.
    */
  def replace(tablePath: String, schema: StructType): Unit =
    writeSchema(tablePath, allNullable(schema))

  private def writeSchema(tablePath: String, merged: StructType): Unit = {
    val p = metaFile(tablePath)
    val fs = p.getFileSystem(ParquetIO.hadoopConf)
    fs.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(merged.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) fs.delete(tmp, false)
  }

  /** The persisted schema, or None when absent/unreadable. */
  def read(tablePath: String): Option[StructType] =
    scala.util.Try {
      val p = metaFile(tablePath)
      val fs = p.getFileSystem(ParquetIO.hadoopConf)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val json = try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) finally in.close()
        Some(DataType.fromJson(json).asInstanceOf[StructType])
      }
    }.toOption.flatten

  /** Field union, first-wins on name conflict (existing type kept). */
  def union(a: StructType, b: StructType): StructType =
    StructType(a.fields ++ b.fields.filterNot(f => a.fieldNames.contains(f.name)))

  /** Recursively nullable variant of `s` (containers too). */
  def allNullable(s: StructType): StructType =
    StructType(s.fields.map(f => f.copy(dataType = nullableType(f.dataType),
      nullable = true)))

  private def nullableType(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case st: StructType => allNullable(st)
    case org.apache.spark.sql.types.ArrayType(et, _) =>
      org.apache.spark.sql.types.ArrayType(nullableType(et), containsNull = true)
    case org.apache.spark.sql.types.MapType(kt, vt, _) =>
      org.apache.spark.sql.types.MapType(nullableType(kt), nullableType(vt),
        valueContainsNull = true)
    case other => other
  }
}
