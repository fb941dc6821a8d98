package graft.sources

import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** JSON "catalog" option → StructType, the reference's user-declared
  * schema discipline for wide-column tables.
  *
  * Format (reference `emr-tablestore/.../TableStoreCatalog.scala:34-48`,
  * example `examples/.../DeltaTableStoreCDC.scala:70-79`):
  * {{{
  * {"columns": {"pk1": {"type": "long"}, "attr": {"type": "string"}}}
  * }}}
  * Types are parsed with `CatalystSqlParser.parseDataType` — any Spark SQL
  * type spelling is accepted, matching the reference's behavior.
  */
object SchemaCatalog {

  def parse(catalogJson: String): StructType = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = JsonMethods.parse(catalogJson)
    val cols = root \ "columns" match {
      case JObject(fields) => fields
      case _ => throw new IllegalArgumentException(
        s"catalog must have a top-level 'columns' object: $catalogJson")
    }
    StructType(cols.map {
      case (name, JObject(attrs)) =>
        val typeStr = attrs.collectFirst { case ("type", JString(t)) => t }
          .getOrElse(throw new IllegalArgumentException(s"column $name missing 'type'"))
        StructField(name, parseType(typeStr), nullable = true)
      case (name, other) =>
        throw new IllegalArgumentException(s"column $name must be an object, got $other")
    })
  }

  private def parseType(t: String): DataType = CatalystSqlParser.parseDataType(t)

  def toJson(schema: StructType): String = {
    val cols = schema.fields.map { f =>
      s""""${f.name}": {"type": "${f.dataType.simpleString}"}"""
    }.mkString(", ")
    s"""{"columns": {$cols}}"""
  }
}
