package graft.sources.kv

import java.util
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.UnboundFunction
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Path-addressed catalog for kv tables — the piece that unlocks
  * storage-partitioned joins: Catalyst only resolves a scan's reported
  * `KeyGroupedPartitioning(bucket(...))` through the RELATION'S function
  * catalog (`V2ScanPartitioningAndOrdering` →
  * `V2ExpressionUtils.toCatalystTransformOpt`), and a path-based
  * `spark.read.format("kv")` relation has none. Register
  * `spark.sql.catalog.<name> = graft.sources.kv.KvCatalog` and read a
  * bucketized table as ``spark.read.table("<name>.`/path/to/table`")`` —
  * same files, same scan, plus the bucket claim.
  *
  * The identifier IS the path (one backquoted part); no metastore, no
  * state — `loadTable` infers the schema from the sidecar/footers
  * exactly like the path-based read. Writes go through the same
  * [[KvTable]] so `saveAsTable`-style flows are possible, but the
  * supported surface is load + function resolution; DDL is rejected.
  */
class KvCatalog extends TableCatalog with FunctionCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString("/")

  override def loadTable(ident: Identifier): Table = {
    val path = pathOf(ident)
    // "not found" is decided by the LISTING, not by inferSchema throwing:
    // swallowing every inference exception as NoSuchTableException would
    // report a transient IO failure or a corrupt footer as a missing
    // table and send debugging the wrong way
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val provider = new KvSource()
    val opts = new CaseInsensitiveStringMap(
      java.util.Collections.singletonMap("path", path))
    val schema = provider.inferSchema(opts) // real errors propagate as-is
    provider.getTable(schema, Array.empty, opts.asCaseSensitiveMap())
  }

  override def tableExists(ident: Identifier): Boolean =
    graft.sources.ParquetIO.listFilesStatus(pathOf(ident)).nonEmpty ||
      KvSchemaMeta.read(pathOf(ident)).isDefined

  override def listTables(namespace: Array[String]): Array[Identifier] = Array.empty

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "kv catalog is path-addressed: write with df.write.format(\"kv\").option(\"path\", ...)")
  /** Schema evolution, metadata-only — NO data rewrite either way (at
    * 100 TB "rewrite the table to evolve the schema" is not a plan):
    *
    *  - `ADD COLUMN` appends nullable columns to the persisted schema
    *    sidecar ([[KvSchemaMeta]]); files written before the evolution
    *    simply lack the column and read as NULL (the kv source's
    *    sparse-attribute read path).
    *  - `ALTER COLUMN … TYPE` WIDENS a column (int → long,
    *    float → double): pre-evolution files keep their narrow storage
    *    and upcast at read time (the row reader's storage-widening
    *    decode; the vectorized plane declines mixed-physical columns,
    *    filter pushdown on them degrades to residuals via the
    *    common-schema check, and footer-aggregate pushdown refuses on
    *    physical/declared mismatch — all pre-existing safety paths).
    *    Narrowing and cross-family changes are REJECTED: old bytes
    *    can't be re-read through a smaller type. A Bloom sidecar
    *    covering the column is dropped — its hashes were computed in
    *    the old value domain (xxhash64 of int ≠ xxhash64 of the same
    *    value as long) and a stale probe would silently prune files
    *    that match; rebuild with [[KvBloom.build]] after widening.
    *    Zone maps survive: both sides of their comparisons normalize
    *    to long/double already.
    *
    * `snapshot.epoch` time travel keeps showing the pre-evolution
    * schema because snapshot inference reads visible files' footers,
    * not the sidecar. Everything else is rejected.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    import org.apache.spark.sql.types._
    val path = pathOf(ident)
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val current = new KvSource().inferSchema(new CaseInsensitiveStringMap(
      java.util.Collections.singletonMap("path", path)))

    def widens(from: DataType, to: DataType): Boolean = (from, to) match {
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }

    var ledger = KvEvolution.read(path)
    val evolved = changes.foldLeft(current) {
      case (schema, add: TableChange.AddColumn) =>
        require(add.fieldNames().length == 1,
          s"kv ADD COLUMN supports top-level columns only, got " +
            add.fieldNames().mkString("."))
        val name = add.fieldNames()(0)
        require(!schema.fieldNames.exists(_.equalsIgnoreCase(name)),
          s"column '$name' already exists in kv table $path")
        require(!ledger.reserved.contains(name.toLowerCase),
          s"kv ADD COLUMN refuses '$name' on $path: the name belongs to a " +
            "dropped or renamed-away column whose bytes persist in old " +
            "files — a name-based store would resurrect them into the new " +
            "column; use a fresh name")
        require(add.position() == null,
          "kv ADD COLUMN appends at the end; FIRST/AFTER positions are not supported")
        // always nullable: pre-evolution files have no values for it
        StructType(schema.fields :+ StructField(name, add.dataType(), nullable = true))
      case (schema, del: TableChange.DeleteColumn) =>
        require(del.fieldNames().length == 1,
          s"kv DROP COLUMN supports top-level columns only, got " +
            del.fieldNames().mkString("."))
        val name = del.fieldNames()(0)
        val idx = schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
        require(idx >= 0, s"column '$name' does not exist in kv table $path")
        require(schema.length > 1,
          s"kv DROP COLUMN would leave table $path without columns")
        // metadata-only: bytes stay in old files, hidden by the schema
        // sidecar. The name — and, for a previously renamed column, its
        // on-disk physical name — joins the tombstone set so no later
        // ADD COLUMN can resurrect the orphaned values.
        val canonical = schema.fieldNames(idx)
        ledger = ledger.copy(
          dropped = ledger.dropped + canonical.toLowerCase ++
            ledger.renames.get(canonical).map(_.toLowerCase),
          renames = ledger.renames - canonical)
        withdrawLayouts(path, canonical)
        StructType(schema.fields.patch(idx, Nil, 1))
      case (schema, ren: TableChange.RenameColumn) =>
        require(ren.fieldNames().length == 1,
          s"kv RENAME COLUMN supports top-level columns only, got " +
            ren.fieldNames().mkString("."))
        val from = ren.fieldNames()(0)
        val to = ren.newName()
        val idx = schema.fieldNames.indexWhere(_.equalsIgnoreCase(from))
        require(idx >= 0, s"column '$from' does not exist in kv table $path")
        require(!schema.fieldNames.exists(_.equalsIgnoreCase(to)),
          s"column '$to' already exists in kv table $path")
        require(!ledger.reserved.contains(to.toLowerCase),
          s"kv RENAME COLUMN refuses '$to' on $path: the name belongs to a " +
            "dropped or renamed-away column whose bytes persist in old files")
        // metadata-only (Iceberg column-mapping name mode): the ledger
        // maps the new logical name to the ORIGINAL physical name —
        // chains collapse, so the reader resolves one hop per file.
        val canonical = schema.fieldNames(idx)
        val physical = ledger.renames.getOrElse(canonical, canonical)
        ledger = ledger.copy(
          renames = ledger.renames - canonical + (to -> physical))
        withdrawLayouts(path, canonical)
        StructType(schema.fields.updated(idx, schema(idx).copy(name = to)))
      case (schema, upd: TableChange.UpdateColumnType) =>
        require(upd.fieldNames().length == 1,
          s"kv ALTER COLUMN supports top-level columns only, got " +
            upd.fieldNames().mkString("."))
        val name = upd.fieldNames()(0)
        val idx = schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
        require(idx >= 0, s"column '$name' does not exist in kv table $path")
        val from = schema(idx).dataType
        if (from != upd.newDataType()) {
          require(widens(from, upd.newDataType()),
            s"kv ALTER COLUMN only widens (INT -> BIGINT, FLOAT -> DOUBLE): " +
              s"'$name' is ${from.simpleString}, requested " +
              s"${upd.newDataType().simpleString} — existing bytes cannot be " +
              "re-read through a narrower or cross-family type")
          // stale hash domain: a bloom built on the narrow type would
          // silently prune files that match the widened probes
          if (KvSidecar.readMeta(path, KvBloom.SidecarName).exists { m =>
            (m \ "columns") match {
              case org.json4s.JArray(cs) =>
                cs.exists { case org.json4s.JString(c) => c.equalsIgnoreCase(name)
                            case _ => false }
              case _ => false
            }
          }) KvSidecar.tombstone(path, KvBloom.SidecarName)
          // same discipline for the bucket layout: murmur3 is
          // type-sensitive, so files placed at the narrow type's hash
          // are WRONG under the widened type — a kept claim would
          // silently mis-route a storage-partitioned join.
          // bucketsFor would also withdraw on the recorded-vs-live type
          // mismatch; deleting here keeps the meta honest on disk.
          if (KvBuckets.bucketsFor(path).exists(_.cols.exists(_.equalsIgnoreCase(name))))
            KvBuckets.record(path, Nil, Nil, 0, Map.empty)
        }
        StructType(schema.fields.updated(idx,
          schema(idx).copy(dataType = upd.newDataType())))
      case (_, other) => throw new UnsupportedOperationException(
        "kv catalog supports ALTER TABLE ADD COLUMN / ALTER COLUMN TYPE / " +
          s"DROP COLUMN / RENAME COLUMN only, got $other")
    }
    KvEvolution.write(path, ledger)
    KvSchemaMeta.replace(path, evolved)
    loadTable(ident)
  }

  /** Drop the name-keyed physical layouts that a column's evolution
    * invalidates: a Bloom sidecar built on the old name would prune by
    * stats the reader no longer consults, and a bucket layout's
    * murmur3 placement is meaningless once the column is gone or
    * answers to a different name — a kept KeyGroupedPartitioning claim
    * would silently mis-route a storage-partitioned join.
    */
  private def withdrawLayouts(path: String, column: String): Unit = {
    if (KvSidecar.readMeta(path, KvBloom.SidecarName).exists { m =>
      (m \ "columns") match {
        case org.json4s.JArray(cs) =>
          cs.exists { case org.json4s.JString(c) => c.equalsIgnoreCase(column)
                      case _ => false }
        case _ => false
      }
    }) KvSidecar.tombstone(path, KvBloom.SidecarName)
    if (KvBuckets.bucketsFor(path).exists(_.cols.exists(_.equalsIgnoreCase(column))))
      KvBuckets.record(path, Nil, Nil, 0, Map.empty)
  }
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("kv catalog does not support DROP TABLE")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("kv catalog does not support RENAME TABLE")

  // ---- FunctionCatalog: the bucket transform ---------------------------
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket")) KvBucketUnbound
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)
}
