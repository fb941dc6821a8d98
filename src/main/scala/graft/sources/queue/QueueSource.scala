package graft.sources.queue

import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.ParquetIO

/** `queue` DataSource V2 — message-queue pull source (SURVEY.md §2
  * T12/T13, the reference's MNS/ONS receivers: `MnsUtils.scala:50-256`,
  * `OnsUtils.scala:71-287`).
  *
  * The reference delivers each queue message exactly once per consumer
  * as a raw `Array[Byte]` payload. Here the queue is a directory; every
  * file is one message (any bytes, not parquet); messages are consumed
  * in arrival (name) order; the stream offset is the count of consumed
  * messages, tracked in Spark's offset log (replacing the service-side
  * dequeue acknowledgment). Schema: `id string, payload binary`.
  */
class QueueSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "queue"
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    QueueSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new QueueTable(new CaseInsensitiveStringMap(properties))
}

object QueueSource {
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  def listMessages(path: String): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(ParquetIO.hadoopConf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isFile).map(_.getPath)
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      .sortBy(_.toString).toSeq
  }
}

case class QueueOffsetV(consumed: Long) extends Offset {
  override def json(): String = consumed.toString
}

case class QueueInputPartition(file: String) extends InputPartition

class QueueTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  private val path = options.get("path")
  override def name(): String = s"queue:$path"
  override def schema(): StructType = QueueSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = QueueSource.schema
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            QueueSource.listMessages(path).map(f => QueueInputPartition(f.toString)).toArray
          override def createReaderFactory(): PartitionReaderFactory = new QueueReaderFactory
        }
        override def toMicroBatchStream(checkpoint: String): MicroBatchStream =
          new QueueMicroBatchStream(path, options)
      }
    }
}

class QueueMicroBatchStream(path: String, options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def getDefaultReadLimit: ReadLimit =
    Option(options.get("maxMessagesPerTrigger"))
      .map(n => ReadLimit.maxFiles(n.toInt)).getOrElse(ReadLimit.allAvailable())

  override def initialOffset(): Offset = QueueOffsetV(0L)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val consumed = start.asInstanceOf[QueueOffsetV].consumed
    val total = QueueSource.listMessages(path).length.toLong
    val budget = limit match {
      case mf: ReadMaxFiles => mf.maxFiles().toLong
      case _ => Long.MaxValue
    }
    QueueOffsetV(math.min(total, consumed + budget))
  }

  override def deserializeOffset(json: String): Offset = QueueOffsetV(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[QueueOffsetV].consumed.toInt
    val e = end.asInstanceOf[QueueOffsetV].consumed.toInt
    QueueSource.listMessages(path).slice(s, e)
      .map(f => QueueInputPartition(f.toString)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new QueueReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class QueueReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[QueueInputPartition]
    new PartitionReader[InternalRow] {
      private var done = false
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (done) false
        else {
          val path = new Path(p.file)
          val fs = path.getFileSystem(ParquetIO.hadoopConf)
          val in = fs.open(path)
          val bytes = try {
            val len = fs.getFileStatus(path).getLen.toInt
            val buf = new Array[Byte](len)
            in.readFully(buf)
            buf
          } finally in.close()
          val row = new GenericInternalRow(2)
          row.update(0, UTF8String.fromString(path.getName))
          row.update(1, bytes)
          current = row
          done = true
          true
        }
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
