package graft.sources.kv

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sources.ParquetIO

/** FILE-granular group-based (copy-on-write) row-level operations for
  * kv tables — the DSv2 surface behind SQL `UPDATE`, `MERGE INTO`, and
  * non-metadata-translatable `DELETE` (`SupportsRowLevelOperations`).
  *
  * The replaced GROUP is the data file. Catalyst's runtime group
  * filtering (`RowLevelOperationRuntimeGroupFiltering`) plans a
  * matching-rows subquery projecting this operation's
  * `requiredMetadataAttributes` (`_file` — the kv metadata column) and
  * pushes `_file IN (matched files)` into the scan as a v2 runtime
  * filter, so only the files that CONTAIN matches are read, rewritten
  * and replaced; every other file is untouched bytes. When the filter
  * does not arrive (rule disabled, non-selective condition, subquery
  * fallback) the scan serves every file and the commit degrades to a
  * full rewrite — which is always consistent, never wrong.
  *
  * THE CONSISTENCY INVARIANT: the committed replacement must cover
  * exactly the files the rewrite plan read (Spark drops other files'
  * rows from the replacement stream via the injected row filter). The
  * scan therefore records its post-filter file set, the commit replaces
  * exactly that set, and an unparseable pushed predicate ABORTS the
  * statement instead of guessing — a wrong guess here silently deletes
  * data.
  *
  * Crash safety (the rlo transaction protocol, `ParquetIO`): new parts
  * land in the table dir as `rlo-<txid>-N.parquet`, INVISIBLE until
  * `_commits/rlo-<txid>` exists; that marker's body lists the replaced
  * file names, which the listing hides from the same instant — ONE
  * atomic rename flips the table from the old state to the new one.
  * A crash before the marker leaves stray invisible parts (vacuum);
  * a crash after it leaves already-hidden replaced files (vacuum);
  * readers never see a torn mix.
  */
class KvRowLevelOperation(
    path: String, tableSchema: StructType,
    cmd: RowLevelOperation.Command,
    maxSplitCount: Int, splitSizeMb: Long)
    extends RowLevelOperation {

  // ONE scan instance per operation (the upstream-connector pattern,
  // e.g. Iceberg's RowLevelOperation): every ScanBuilder.build() from
  // this operation — the rewrite scan AND any matching-rows-subquery
  // scan Catalyst plans from the same relation — returns the SAME
  // object, so the runtime group filter lands on the scan the commit
  // reads no matter which plan copy delivered it. The previous
  // last-created-wins scheme rested on a planner internal (the subquery
  // being planned against the original table, not this operation).
  private[kv] lazy val currentScan: KvRloScan =
    new KvRloScan(path, tableSchema, maxSplitCount, splitSizeMb)

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"kv copy-on-write $cmd (file groups)"

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column("_file"))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = currentScan
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new KvReplaceDataWrite(path, info.schema(), () => currentScan.replacedFiles())
      }
    }
}

/** The rewrite scan: full-table kv scan + the `_file` column, with v2
  * runtime filtering on `_file` ONLY — the group-pruning handshake.
  * No filter pushdown, no stats-based pruning: the replaced group must
  * be exactly what gets read (see [[KvRowLevelOperation]]).
  */
class KvRloScan(path: String, tableSchema: StructType,
    maxSplitCount: Int, splitSizeMb: Long)
    extends Scan with Batch with SupportsRuntimeV2Filtering {

  // row plane (the _file column rides per chunk) — rewrites are
  // maintenance ops, the columnar plane is not worth a second code path
  private val inner = new KvScan(path, tableSchema, tableSchema, None,
    Array.empty, maxSplitCount, splitSizeMb, vectorized = false,
    snapshotEpoch = None, withFilePath = true)

  @volatile private var allowedFiles: Option[Set[String]] = None

  override def readSchema(): StructType = inner.readSchema()
  override def toBatch: Batch = this
  override def description(): String = s"kv-rlo(file-groups, $path)"

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("_file"))

  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    if (predicates.isEmpty) return
    // Every pushed predicate MUST resolve to a file set: Spark's rewrite
    // drops other files' rows from the replacement stream, so ignoring a
    // predicate here would make the commit delete data it never read.
    val sets = predicates.map(KvRloScan.fileSet)
    sets.zip(predicates).foreach { case (s, p) =>
      require(s.isDefined,
        s"kv row-level rewrite: unsupported runtime group filter $p — " +
          "refusing to guess the replaced file set")
    }
    allowedFiles = Some(sets.map(_.get).reduce(_ intersect _))
    KvRloScan.recordGroupFilter(path)
  }

  /** The post-filter visible file set — what the plan reads and the
    * commit must replace. Computed from live state at call time, so
    * commit-time reads see the final filter.
    */
  def replacedFiles(): Set[String] = {
    val visible = ParquetIO.listFiles(path).map(_.toString).toSet
    allowedFiles match {
      case Some(allowed) => visible.intersect(allowed)
      case None => visible
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val parts = inner.toBatch.planInputPartitions()
    allowedFiles match {
      case None => parts
      case Some(allowed) => parts.flatMap { p =>
        val kept = p.asInstanceOf[KvInputPartition].chunks
          .filter(c => allowed.contains(c.file))
        if (kept.isEmpty) None else Some(KvInputPartition(kept): InputPartition)
      }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    inner.toBatch.createReaderFactory()
}

object KvRloScan {
  import org.apache.spark.sql.connector.expressions.{Expression, Literal => V2Literal}
  import org.apache.spark.sql.connector.expressions.filter.Predicate

  /** Observability seam (gates + specs): a PER-PATH monotonic counter of
    * runtime group filters that LANDED on rlo scans of that table.
    * `q_cdc_stream_merge` asserts per batch that the counter for ITS
    * table advanced across the MERGE — the claim that a streaming
    * MERGE's per-batch rewrite cost is bounded by the matched file
    * groups (batch size), not the table size, is pinned by the filter's
    * arrival, not just stated. Keyed by table path (not a single global
    * slot) so concurrent queries on OTHER tables can neither false-pass
    * nor false-fail the assertion; bench/test observability only — never
    * load-bearing for correctness.
    */
  private val groupFilterEvents =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private[kv] def recordGroupFilter(path: String): Unit = {
    groupFilterEvents.merge(path, 1L, (a, b) => a + b); ()
  }

  /** How many runtime group filters have landed on rlo scans of `path`
    * since JVM start — compare before/after a MERGE to pin its arrival.
    */
  def groupFilterCount(path: String): Long =
    Option(groupFilterEvents.get(path)).map(_.longValue).getOrElse(0L)

  private def fileRef(e: Expression): Boolean = e match {
    case r: NamedReference => r.fieldNames().sameElements(Array("_file"))
    case _ => false
  }
  private def strLit(e: Expression): Option[String] = e match {
    case l: V2Literal[_] => Option(l.value).map(_.toString)
    case _ => None
  }

  /** Predicate → the exact file set it admits, or None if unsupported. */
  private[kv] def fileSet(p: Predicate): Option[Set[String]] = p.name() match {
    case "IN" =>
      val children = p.children()
      if (children.nonEmpty && fileRef(children.head)) {
        val lits = children.tail.map(strLit)
        if (lits.forall(_.isDefined)) Some(lits.flatten.toSet) else None
      } else None
    case "=" =>
      val children = p.children()
      if (children.length == 2 && fileRef(children(0)))
        strLit(children(1)).map(Set(_))
      else if (children.length == 2 && fileRef(children(1)))
        strLit(children(0)).map(Set(_))
      else None
    case "AND" =>
      val children = p.children().collect { case q: Predicate => q }
      if (children.length != 2) None
      else for (a <- fileSet(children(0)); b <- fileSet(children(1)))
        yield a.intersect(b)
    case "OR" =>
      val children = p.children().collect { case q: Predicate => q }
      if (children.length != 2) None
      else for (a <- fileSet(children(0)); b <- fileSet(children(1)))
        yield a.union(b)
    case _ => None
  }
}

/** Commit = atomic partial replacement via the rlo transaction marker:
  * tasks write the replacement rows to a tmp dir; commit moves them
  * into the table as invisible `rlo-<txid>-N.parquet` files, then ONE
  * marker rename makes them visible and the replaced files invisible
  * in the same instant; finally the replaced bytes are deleted
  * (best-effort — they are already invisible, vacuum sweeps leftovers).
  */
class KvReplaceDataWrite(path: String, schema: StructType,
    replacedFiles: () => Set[String]) extends BatchWrite {
  private val tmp = s"$path.rlo-tmp"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    ParquetIO.deletePath(tmp)
    new Path(tmp).getFileSystem(ParquetIO.hadoopConf).mkdirs(new Path(tmp))
    val inner = new KvWriterFactory(tmp, schema)
    val dataTypes = schema.fields.map(_.dataType)
    new DataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
        val w = inner.createWriter(partitionId, taskId)
        new DataWriter[InternalRow] {
          // The physical rows of a group-based rewrite carry Spark's
          // leading `__row_operation` column (RowDeltaUtils) that
          // LogicalWriteInfo's schema does NOT include: strip it
          // positionally before the parquet writer.
          private val reused =
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(dataTypes.length)
          override def write(record: InternalRow): Unit = {
            if (record.numFields == dataTypes.length) w.write(record)
            else {
              require(record.numFields == dataTypes.length + 1,
                s"replace-data row has ${record.numFields} fields, " +
                  s"expected ${dataTypes.length} (+1 op column)")
              var i = 0
              while (i < dataTypes.length) {
                if (record.isNullAt(i + 1)) reused.setNullAt(i)
                else reused.update(i, record.get(i + 1, dataTypes(i)))
                i += 1
              }
              w.write(reused)
            }
          }
          override def commit(): WriterCommitMessage = w.commit()
          override def abort(): Unit = w.abort()
          override def close(): Unit = w.close()
        }
      }
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(ParquetIO.hadoopConf)
    val replaced = replacedFiles() // post-filter: what the plan read
    val txid = java.util.UUID.randomUUID().toString.replace("-", "")
    // stage the new parts as INVISIBLE rlo files inside the table dir
    val tmpFiles = ParquetIO.listFiles(tmp)
    tmpFiles.zipWithIndex.foreach { case (f, i) =>
      require(fs.rename(f, new Path(path, s"rlo-$txid-$i.parquet")),
        s"failed to stage ${f.getName}")
    }
    // THE atomic flip: new parts visible + replaced names hidden. The
    // marker records the epoch watermark so snapshot reads below it
    // fail instead of silently serving post-rewrite values.
    ParquetIO.writeRloMarker(path, txid, replaced.map(new Path(_).getName).toSeq,
      ParquetIO.maxCommittedEpoch(path))
    // physical cleanup (already invisible; vacuum sweeps on crash)
    replaced.foreach(f => fs.delete(new Path(f), false))
    ParquetIO.deletePath(tmp)
    KvSchemaMeta.record(path, schema)
    // a partial rewrite invalidates clustered/bucketized layout claims
    KvClustering.record(path, Nil)
    KvBuckets.record(path, Nil, Nil, 0, Map.empty)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    ParquetIO.deletePath(tmp)
}
