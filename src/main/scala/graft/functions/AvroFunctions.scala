package graft.functions

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Generic Avro-record decoding — the schema-registry table surface of
  * the reference re-expressed locally (SURVEY.md §2 watch-list: the
  * baseline harness declares Kafka tables whose value schema comes from
  * a registry, `emr-baseline-testing/tables/kafka_store_sales.sql:6-13`,
  * records produced by `ReplicateHiveTableToKafka.scala:30-66`).
  *
  * `from_avro_record(value, schemaJson)` decodes binary-encoded generic
  * records into a struct derived from the Avro schema: primitives,
  * nullable unions, enum→string, bytes/fixed (incl. logical decimals),
  * arrays and string-keyed maps. The log source mounts the same decoder
  * as a table format (`value.format=avro`).
  */
object AvroFunctions {

  import scala.jdk.CollectionConverters._

  def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => s.getLogicalType match {
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1, s"only nullable unions are supported: $s")
      sparkType(branches.head)
    case Schema.Type.ARRAY => ArrayType(sparkType(s.getElementType))
    case Schema.Type.MAP => MapType(StringType, sparkType(s.getValueType))
    case other => throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  def structTypeOf(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"need an avro record, got $schema")
    StructType(schema.getFields.asScala.map(f =>
      StructField(f.name, sparkType(f.schema), nullable = true)).toSeq)
  }

  private def nonNull(s: Schema): Schema = s.getType match {
    case Schema.Type.UNION =>
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    case _ => s
  }

  /** Avro runtime value → Catalyst value for the given (resolved) schema. */
  private def toCatalyst(v: Any, s0: Schema): Any = {
    if (v == null) return null
    val s = nonNull(s0)
    s.getType match {
      case Schema.Type.BOOLEAN | Schema.Type.INT | Schema.Type.LONG |
           Schema.Type.FLOAT | Schema.Type.DOUBLE => v
      case Schema.Type.STRING | Schema.Type.ENUM =>
        UTF8String.fromString(v.toString)
      case Schema.Type.BYTES | Schema.Type.FIXED =>
        val bytes = v match {
          case bb: java.nio.ByteBuffer =>
            val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
          case f: org.apache.avro.generic.GenericFixed => f.bytes()
          case a: Array[Byte] => a
        }
        s.getLogicalType match {
          case d: LogicalTypes.Decimal =>
            Decimal(BigDecimal(BigInt(bytes), d.getScale), d.getPrecision, d.getScale)
          case _ => bytes
        }
      case Schema.Type.ARRAY =>
        val items = v.asInstanceOf[java.util.List[AnyRef]].asScala
        new GenericArrayData(items.map(toCatalyst(_, s.getElementType)).toArray[Any])
      case Schema.Type.MAP =>
        val m = v.asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala
          .toSeq.sortBy(_._1.toString)
        new ArrayBasedMapData(
          new GenericArrayData(m.map(e => UTF8String.fromString(e._1.toString)).toArray[Any]),
          new GenericArrayData(m.map(e => toCatalyst(e._2, s.getValueType)).toArray[Any]))
      case other => throw new IllegalArgumentException(s"unsupported avro type $other")
    }
  }

  def decodeRecord(rec: GenericRecord, schema: Schema): InternalRow = {
    val fields = schema.getFields.asScala
    val row = new GenericInternalRow(fields.length)
    var i = 0
    while (i < fields.length) {
      row.update(i, toCatalyst(rec.get(i), fields(i).schema))
      i += 1
    }
    row
  }

  case class FromAvroRecord(child: Expression, schemaJson: String)
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val avroSchema = new Schema.Parser().parse(schemaJson)
    @transient private lazy val reader =
      new GenericDatumReader[GenericRecord](avroSchema)
    override lazy val dataType: DataType = structTypeOf(avroSchema)
    override def nullable: Boolean = true
    override protected def nullSafeEval(input: Any): Any = {
      val dec = DecoderFactory.get()
        .binaryDecoder(input.asInstanceOf[Array[Byte]], null)
      decodeRecord(reader.read(null, dec), avroSchema)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "from_avro_record"
  }

  /** `df.select(fromAvroRecord(col("value"), schemaJson).as("r")).select("r.*")` */
  def fromAvroRecord(c: Column, schemaJson: String): Column =
    toColumn(FromAvroRecord(exprOf(c), schemaJson))
}
