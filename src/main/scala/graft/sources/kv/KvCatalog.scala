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
  /** Schema evolution, metadata-only: `ALTER TABLE … ADD COLUMN` appends
    * nullable columns to the persisted schema sidecar ([[KvSchemaMeta]])
    * — NO data rewrite (at 100 TB "rewrite the table to add a column" is
    * not a plan). Files written before the evolution simply lack the
    * column and read as NULL (the kv source's sparse-attribute read
    * path); `snapshot.epoch` time travel keeps showing the pre-evolution
    * schema because snapshot inference reads visible files' footers, not
    * the sidecar. Everything except ADD COLUMN is rejected.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = pathOf(ident)
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    val current = new KvSource().inferSchema(new CaseInsensitiveStringMap(
      java.util.Collections.singletonMap("path", path)))
    val added = changes.map {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          s"kv ADD COLUMN supports top-level columns only, got " +
            add.fieldNames().mkString("."))
        val name = add.fieldNames()(0)
        require(!current.fieldNames.exists(_.equalsIgnoreCase(name)),
          s"column '$name' already exists in kv table $path")
        require(add.position() == null,
          "kv ADD COLUMN appends at the end; FIRST/AFTER positions are not supported")
        // always nullable: pre-evolution files have no values for it
        org.apache.spark.sql.types.StructField(name, add.dataType(), nullable = true)
      case other => throw new UnsupportedOperationException(
        s"kv catalog supports ALTER TABLE ADD COLUMN only, got $other")
    }
    KvSchemaMeta.record(path,
      KvSchemaMeta.union(current, org.apache.spark.sql.types.StructType(added)))
    loadTable(ident)
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
