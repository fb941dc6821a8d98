package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns next to a typed metadata
  * struct — the layout that scales: bytes stay columnar in parquet,
  * metadata predicates prune row groups without touching payloads,
  * and per-batch decode runs inside `mapPartitions` with bounded memory.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[FakeCodec]] derives deterministic "decoded" properties
  * from the payload bytes. Every Spark-side surface — schema, batch
  * iteration shape, partitioning, null handling — is real and tested;
  * swapping [[FakeCodec.decode]] for a JNI/javax.imageio call is the
  * only production change.
  */
object Multimodal {

  /** Typed metadata carried beside the payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** ======= STUB BOUNDARY =======
    * Deterministic fake codec standing in for imageio/ffmpeg. Properties
    * are pure functions of the payload so tests and oracles reproduce.
    */
  object FakeCodec {
    def decode(payload: Array[Byte]): (String, Int, Int) = {
      val n = payload.length
      val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
      val width = (n % 640) + 1
      val height = (n % 480) + 1
      (fmt, width, height)
    }
    /** "Resize": deterministic resample of the byte stream to w*h/64 bytes. */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val outLen = math.max(w * h / 64, 1)
      Array.tabulate(outLen)(i => payload(i % math.max(payload.length, 1)))
    }
    /** "Frame sample": split payload into `n` pseudo-frames. */
    def frames(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val size = math.max(payload.length / math.max(n, 1), 1)
      payload.grouped(size).take(n).toSeq
    }
  }

  /** Attach a binary payload column derived from a string column (fixture
    * helper — real pipelines read payloads from storage).
    */
  def withBinaryPayload(df: DataFrame, srcCol: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, encode(col(srcCol), "UTF-8"))

  /** Decode metadata for each payload in partition-local batches.
    * Runs as `mapPartitions` over an iterator — constant memory per task,
    * no driver involvement, codec initialized once per partition (the
    * expensive part with real codecs).
    */
  def decodeMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("media", metaSchema))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // per-partition codec init would go here (expensive for real codecs)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val media = if (payload == null) null else {
          val (fmt, w, h) = FakeCodec.decode(payload)
          Row(fmt, w, h, payload.length.toLong)
        }
        Row.fromSeq(r.toSeq :+ media)
      }
    }(enc)
  }

  /** Batched resize: constant-size output payloads (e.g. thumbnailing a
    * 100 TB image corpus). Output column replaces the payload.
    */
  def resize(df: DataFrame, payloadCol: String, w: Int, h: Int): DataFrame = {
    val schema = df.schema
    val payloadIdx = schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val out = if (payload == null) null else FakeCodec.resize(payload, w, h)
        Row.fromSeq(r.toSeq.updated(payloadIdx, out))
      }
    }(enc)
  }

  /** Frame sampling: one output row per sampled frame (video → frames).
    * Emits (original columns..., frame_idx, frame) — a generator-style
    * explode executed partition-locally.
    */
  def sampleFrames(df: DataFrame, payloadCol: String, framesPerDoc: Int): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        if (payload == null) Iterator.empty
        else FakeCodec.frames(payload, framesPerDoc).iterator.zipWithIndex.map {
          case (f, i) => Row.fromSeq(r.toSeq ++ Seq(i, f))
        }
      }
    }(enc)
  }
}
