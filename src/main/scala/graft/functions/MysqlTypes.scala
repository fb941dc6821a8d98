package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed decoding of mysql binlog image values — the reference's
  * `MysqlFieldConverter.java:1-396` semantics (typed numerics, temporal
  * types, charsets, binary) re-expressed as codegen'd column
  * expressions over the string-valued before/after images the binlog
  * parser emits (`BinlogAvro`). All conversions are built-in Catalyst
  * functions — whole-stage codegen keeps the decode row-local, nothing
  * shuffles, and the mapping is deterministic so a DuckDB oracle can
  * replay it (public MySQL type-system knowledge only).
  *
  * Textual conventions are the ones binlog connectors deliver:
  * decimal/ints as plain digit strings, DATETIME as
  * `yyyy-MM-dd HH:mm:ss[.ffffff]`, mysql zero-dates (`0000-00-00...`)
  * as typed NULL, BINARY/BLOB hex-encoded, BIT as a digit string.
  * TIME stays a string: mysql TIME spans `-838:59:59..838:59:59`,
  * which no Spark temporal type represents.
  */
object MysqlTypes {

  private val TypeRe = """(?s)\s*([a-z0-9]+)\s*(?:\(\s*([^)]*)\s*\))?(.*)""".r
  private val CharsetRe = """charset\s+([a-z0-9_]+)""".r

  /** Convert one image value per a mysql column declaration, e.g.
    * `"bigint unsigned"`, `"decimal(12,2)"`, `"datetime(6)"`,
    * `"varchar(64) charset utf8mb4"`.
    */
  def convert(value: Column, declared: String): Column = {
    val TypeRe(base, argsRaw, restRaw) = declared.trim.toLowerCase
    val args = Option(argsRaw).map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty)
    val rest = Option(restRaw).getOrElse("")
    val unsigned = rest.contains("unsigned")
    base match {
      case "tinyint" | "smallint" | "mediumint" => value.cast("int")
      case "int" | "integer" => if (unsigned) value.cast("long") else value.cast("int")
      // unsigned bigint exceeds Long — decimal(20,0) holds the full range
      case "bigint" => if (unsigned) value.cast("decimal(20,0)") else value.cast("long")
      case "bit" => value.cast("long")
      case "year" => value.cast("int")
      case "decimal" | "numeric" =>
        val p = args.headOption.filter(_.nonEmpty).map(_.toInt).getOrElse(10)
        val s = args.lift(1).map(_.toInt).getOrElse(0)
        value.cast(s"decimal($p,$s)")
      case "float" => value.cast("float")
      case "double" | "real" => value.cast("double")
      case "date" => nullifyZeroDate(value).cast("date")
      case "datetime" | "timestamp" => nullifyZeroDate(value).cast("timestamp")
      case "time" => value
      case "char" | "varchar" | "text" | "tinytext" | "mediumtext" | "longtext" =>
        CharsetRe.findFirstMatchIn(rest).map(_.group(1)) match {
          case Some(cs) if cs != "latin1" && cs != "ascii" =>
            // Transport decoded the column's bytes as latin1 (every byte
            // maps to the same code point) — re-encode latin1 to recover
            // the raw bytes, then decode with the declared charset.
            decode(encode(value, "ISO-8859-1"), javaCharset(cs))
          case _ => value
        }
      case "enum" | "set" | "json" => value
      case "binary" | "varbinary" | "tinyblob" | "blob" | "mediumblob" | "longblob" =>
        unhex(value)
      case _ => throw new IllegalArgumentException(s"unsupported mysql type: $declared")
    }
  }

  /** mysql zero-dates ('0000-00-00', '0000-00-00 00:00:00') → NULL. */
  private def nullifyZeroDate(v: Column): Column =
    when(v.startsWith("0000-00-00"), lit(null)).otherwise(v)

  private def javaCharset(cs: String): String = cs match {
    case "utf8" | "utf8mb3" | "utf8mb4" => "UTF-8"
    case "latin1" => "ISO-8859-1"
    case "ascii" => "US-ASCII"
    case "utf16" => "UTF-16"
    case other => throw new IllegalArgumentException(s"unsupported mysql charset: $other")
  }

  /** Decode a string→string image map into a typed struct laid out as
    * `columns` (name → mysql type declaration). Absent keys read as
    * typed NULLs — partial images (mysql binlog minimal row format)
    * carry only the changed columns.
    */
  def typedImage(image: Column, columns: Seq[(String, String)]): Column =
    struct(columns.map { case (n, t) => convert(element_at(image, n), t).as(n) }: _*)
}
