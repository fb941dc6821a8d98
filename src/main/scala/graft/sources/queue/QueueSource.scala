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
  * as a raw `Array[Byte]` payload, acknowledging (deleting) it after the
  * batch is durable. Here the queue is a directory; every file is one
  * message (any bytes, not parquet). Each micro-batch takes the
  * name-sorted head of the *pending* listing, the offset records the
  * batch's explicit file-name list (so replay after restart re-reads
  * exactly the same messages, whatever arrived since), and `commit`
  * acknowledges by moving consumed files to `.consumed/` (or deleting
  * them with `consumed.action=delete`) — the MNS dequeue-ack, not a
  * positional cursor. Message names that sort before already-consumed
  * names therefore neither shift delivery nor get skipped.
  * Schema: `id string, payload binary`.
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

/** `acked` counts messages acknowledged before this batch (monotonic, so
  * consecutive empty batches compare equal and non-empty ones don't);
  * `batch` is the explicit name list of this batch's messages.
  */
case class QueueOffsetV(acked: Long, batch: Seq[String]) extends Offset {
  override def json(): String = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    org.json4s.jackson.Serialization.write(Map("acked" -> acked, "batch" -> batch))
  }
}

object QueueOffsetV {
  def parse(json: String): QueueOffsetV = {
    val t = json.trim
    if (t.startsWith("{")) {
      val v = org.json4s.jackson.JsonMethods.parse(t)
      implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
      QueueOffsetV((v \ "acked").extract[Long], (v \ "batch").extract[Seq[String]])
    } else QueueOffsetV(t.toLong, Nil) // legacy positional offset: best effort
  }
}

case class QueueInputPartition(file: String) extends InputPartition

class QueueTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  private val path = options.get("path")
  override def name(): String = s"queue:$path"
  override def schema(): StructType = QueueSource.schema
  override def properties(): java.util.Map[String, String] = options.asCaseSensitiveMap()
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
    extends MicroBatchStream with SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  // Trigger.AvailableNow boundary: messages present at query start
  private var fixedNames: Option[Seq[String]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    fixedNames = Some(QueueSource.listMessages(path).map(_.getName))

  // live listing, optionally bounded by the AvailableNow start snapshot:
  // acked (moved) messages drop out of the listing, late arrivals are
  // excluded by the snapshot — the drain terminates at the boundary
  private def pendingNames: Seq[String] = {
    val live = QueueSource.listMessages(path).map(_.getName)
    fixedNames match {
      case Some(fixed) =>
        val f = fixed.toSet
        live.filter(f)
      case None => live
    }
  }

  private val deleteOnAck =
    "delete".equalsIgnoreCase(options.getOrDefault("consumed.action", "archive"))

  override def getDefaultReadLimit: ReadLimit =
    Option(options.get("maxMessagesPerTrigger"))
      .map(n => ReadLimit.maxFiles(n.toInt)).getOrElse(ReadLimit.allAvailable())

  override def initialOffset(): Offset = QueueOffsetV(0L, Nil)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[QueueOffsetV]
    val budget = limit match {
      case mf: ReadMaxFiles => mf.maxFiles()
      case _ => Int.MaxValue
    }
    // pending = present minus the in-flight batch (normally already acked
    // away by commit; the exclusion covers a failed/skipped ack)
    val inFlight = s.batch.toSet
    val next = pendingNames.filterNot(inFlight).take(budget)
    QueueOffsetV(s.acked + s.batch.length, next)
  }

  override def reportLatestOffset(): Offset = QueueOffsetV(0L, pendingNames)

  override def deserializeOffset(json: String): Offset = QueueOffsetV.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val dir = new Path(path)
    end.asInstanceOf[QueueOffsetV].batch
      .map(n => QueueInputPartition(new Path(dir, n).toString)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new QueueReaderFactory

  /** Acknowledge: the batch is durable in the sink — retire its messages
    * from the queue (the MNS delete-after-receipt).
    */
  override def commit(end: Offset): Unit = {
    val batch = end.asInstanceOf[QueueOffsetV].batch
    if (batch.nonEmpty) {
      val dir = new Path(path)
      val fs = dir.getFileSystem(ParquetIO.hadoopConf)
      val archive = new Path(dir, ".consumed")
      if (!deleteOnAck) fs.mkdirs(archive)
      batch.foreach { n =>
        val f = new Path(dir, n)
        if (fs.exists(f)) {
          if (deleteOnAck) fs.delete(f, false)
          else fs.rename(f, new Path(archive, n))
        }
      }
    }
  }

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
