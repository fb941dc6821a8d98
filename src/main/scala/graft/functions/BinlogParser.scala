package graft.functions

import java.io.ByteArrayOutputStream
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DB-binlog Avro decoding UDTF — the reference's `dts_binlog_parser`
  * (SURVEY.md §2.4 U2, `emr-sql/.../FromDTSAvroUDF.scala:43-196`)
  * re-expressed as a Catalyst `Generator`.
  *
  * Output row (reference 9-column layout, `FromDTSAvroUDF.scala:78-97`),
  * with before/after images as `map<string,string>` instead of the
  * reference's JSON-encoded strings (FIXTURES.md A.4 note):
  * recordID long, source string, dbTable string, recordType string,
  * recordTimestamp timestamp, extraTags map, fields array<string>,
  * beforeImages map, afterImages map.
  *
  * The Avro reader is initialized once per task (lazy field), mirroring
  * the reference's per-instance deserializer reuse.
  */
object BinlogAvro {

  val schemaJson: String =
    """{"type":"record","name":"BinlogRecord","namespace":"graft.binlog","fields":[
      | {"name":"recordID","type":"long"},
      | {"name":"source","type":"string"},
      | {"name":"dbTable","type":"string"},
      | {"name":"recordType","type":"string"},
      | {"name":"recordTimestamp","type":"long"},
      | {"name":"extraTags","type":{"type":"map","values":"string"}},
      | {"name":"fields","type":{"type":"array","items":"string"}},
      | {"name":"beforeImages","type":{"type":"map","values":"string"}},
      | {"name":"afterImages","type":{"type":"map","values":"string"}}]}""".stripMargin

  lazy val schema: Schema = new Schema.Parser().parse(schemaJson)

  val outputSchema: StructType = StructType(Seq(
    StructField("recordID", LongType, nullable = false),
    StructField("source", StringType),
    StructField("dbTable", StringType),
    StructField("recordType", StringType),
    StructField("recordTimestamp", TimestampType),
    StructField("extraTags", MapType(StringType, StringType)),
    StructField("fields", ArrayType(StringType)),
    StructField("beforeImages", MapType(StringType, StringType)),
    StructField("afterImages", MapType(StringType, StringType))))

  /** Encode one record (test/fixture helper). recordTimestamp in millis. */
  def encode(recordID: Long, source: String, dbTable: String, recordType: String,
      recordTimestampMs: Long, extraTags: Map[String, String], fields: Seq[String],
      before: Map[String, String], after: Map[String, String]): Array[Byte] = {
    import scala.jdk.CollectionConverters._
    val rec = new GenericData.Record(schema)
    rec.put("recordID", recordID)
    rec.put("source", source)
    rec.put("dbTable", dbTable)
    rec.put("recordType", recordType)
    rec.put("recordTimestamp", recordTimestampMs)
    rec.put("extraTags", extraTags.asJava)
    rec.put("fields", fields.asJava)
    rec.put("beforeImages", before.asJava)
    rec.put("afterImages", after.asJava)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  case class BinlogParserExpr(child: Expression)
      extends UnaryExpression with Generator with CodegenFallback {
    override def elementSchema: StructType = BinlogAvro.outputSchema

    @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)

    private def utf8(v: Any): UTF8String =
      if (v == null) null else UTF8String.fromString(v.toString)

    private def mapData(v: Any): ArrayBasedMapData = {
      import scala.jdk.CollectionConverters._
      val m = v.asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala
      val entries = m.toSeq.sortBy(_._1.toString)
      new ArrayBasedMapData(
        new GenericArrayData(entries.map(e => utf8(e._1)).toArray[Any]),
        new GenericArrayData(entries.map(e => utf8(e._2)).toArray[Any]))
    }

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val bytes = child.eval(input)
      if (bytes == null) return Iterator.empty
      val dec = DecoderFactory.get().binaryDecoder(bytes.asInstanceOf[Array[Byte]], null)
      val rec = reader.read(null, dec)
      import scala.jdk.CollectionConverters._
      val fields = rec.get("fields").asInstanceOf[java.util.List[AnyRef]].asScala
      val row = InternalRow(
        rec.get("recordID").asInstanceOf[Long],
        utf8(rec.get("source")),
        utf8(rec.get("dbTable")),
        utf8(rec.get("recordType")),
        rec.get("recordTimestamp").asInstanceOf[Long] * 1000L, // ms → micros
        mapData(rec.get("extraTags")),
        new GenericArrayData(fields.map(utf8).toArray[Any]),
        mapData(rec.get("beforeImages")),
        mapData(rec.get("afterImages")))
      Iterator.single(row)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "binlog_parser"
  }

  /** `df.select(binlogParser(col("value")))` → 9 columns per record. */
  def binlogParser(c: Column): Column = toColumn(BinlogParserExpr(exprOf(c)))
}
