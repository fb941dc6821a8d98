package graft.sources.kv

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sources.ParquetIO

/** Group-based (copy-on-write) row-level operations for kv tables — the
  * DSv2 surface behind SQL `UPDATE`, `MERGE INTO`, and
  * non-metadata-translatable `DELETE` (`SupportsRowLevelOperations`):
  * Catalyst rewrites the statement into a plan that reads the affected
  * groups through [[newScanBuilder]], computes the replacement rows
  * (updated + copied), and commits them through [[newWriteBuilder]],
  * which REPLACES what the scan read.
  *
  * Group granularity is the WHOLE TABLE in this implementation: the
  * operation scan deliberately implements neither filter pushdown nor
  * runtime filtering, so the rewrite reads every visible row and the
  * commit is the same crash-safe backup-aside whole-table swap as
  * `KvMerge` maintenance (`path.merge-old` convention — a crash mid-swap
  * heals through `KvMerge.recoverSwap` on the next maintenance run, or
  * by any reader preferring the backup when live is missing). File-level
  * group filtering (rewrite only the files containing matches, via
  * runtime filtering coordinated between this scan and write) is the
  * optimization path on top of this contract.
  *
  * Why pushdown must stay off here: a rewrite scan that pruned rows (or
  * files) the write then fails to copy would DELETE them — the scan/
  * write pair must agree exactly on the replaced group, and whole-table
  * is the one granularity the base scan/write already guarantee.
  */
class KvRowLevelOperation(
    path: String, tableSchema: StructType,
    cmd: RowLevelOperation.Command,
    maxSplitCount: Int, splitSizeMb: Long, vectorized: Boolean)
    extends RowLevelOperation {

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"kv copy-on-write $cmd (whole-table group)"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new KvRloScan(new KvScan(
        path, tableSchema, tableSchema, None, Array.empty,
        maxSplitCount, splitSizeMb, vectorized, None))
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new KvReplaceDataWrite(path, info.schema())
      }
    }
}

/** The rewrite scan: delegates to a full-table [[KvScan]] but exposes
  * NONE of its pushdown/runtime-filtering/partitioning traits — the
  * replaced group must be exactly what gets read (see
  * [[KvRowLevelOperation]]).
  */
class KvRloScan(inner: KvScan) extends Scan with Batch {
  override def readSchema(): StructType = inner.readSchema()
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    inner.toBatch.planInputPartitions()
  override def createReaderFactory(): PartitionReaderFactory =
    inner.toBatch.createReaderFactory()
  override def description(): String = s"kv-rlo(${inner.description()})"
}

/** Commit = atomic whole-table replacement: tasks write the replacement
  * rows to a sibling tmp dir, commit swaps it into place behind a
  * backup (a committed state exists on disk at every instant), abort
  * drops the tmp. Layout metadata (clustering/bucket claims) is cleared
  * — the rewrite produced a new physical layout.
  */
class KvReplaceDataWrite(path: String, schema: StructType) extends BatchWrite {
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
          // leading `__row_operation` column (RowDeltaUtils — constant
          // WRITE_WITH_METADATA_OPERATION here) that LogicalWriteInfo's
          // schema does NOT include: strip it before the parquet writer,
          // which binds field positions to the table schema.
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
    val live = new Path(path)
    val backup = new Path(s"$path.merge-old")
    ParquetIO.deletePath(backup.toString) // stale backup from a completed swap
    if (fs.exists(live)) fs.rename(live, backup)
    fs.rename(new Path(tmp), live)
    fs.delete(backup, true)
    KvSchemaMeta.record(path, schema)
    KvClustering.record(path, Nil)
    KvBuckets.record(path, Nil, 0, Map.empty)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    ParquetIO.deletePath(tmp)
}
