package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CDC column-value resolution — the reference's `ots_col_parser` Hive UDF
  * re-expressed as a codegen'd conditional (no UDF needed).
  *
  * Reference semantics (`emr-sql/src/main/scala/org/apache/spark/sql/
  * aliyun/udfs/tablestore/ResolveTableStoreBinlogUDF.scala:29-49,82-89`):
  * given a user column value and its per-column CDC op type, return the
  * value for `PUT`, and NULL for `DELETE_ONE_VERSION` / `DELETE_ALL_VERSION`
  * (the downstream MERGE then interprets NULL as column deletion). The
  * reference needed one Hive UDF overload per type; a Catalyst `when` is
  * type-generic and stays inside whole-stage codegen.
  */
object CdcFunctions {

  val OpPut = "PUT"
  val OpDeleteOneVersion = "DELETE_ONE_VERSION"
  val OpDeleteAllVersion = "DELETE_ALL_VERSION"

  /** Meta-column names emitted by the CDC stream source (reference
    * `TableStoreSource.scala:214-229`, renamed without the vendor prefix).
    */
  val RecordTypeCol = "__record_type__"
  val RecordTimestampCol = "__record_timestamp__"
  def columnTypeCol(col: String): String = s"__column_type_$col"

  /** Change sequence synthesized by the cdc source: (changelog file
    * sequence << 32) | row position in file. A total order over the
    * changelog, used as the tiebreak when two changes to one key share a
    * record timestamp (e.g. PUT then DELETE committed in one batch).
    */
  val RecordSeqCol = "__cdc_seq__"

  /** `cdc_col_parser(value, opType)` — value if opType = PUT else NULL. */
  def cdcColParser(value: Column, opType: Column): Column =
    when(opType === OpPut, value).otherwise(lit(null))

  /** Register the SQL spelling `cdc_col_parser(col, op)` so SQL-surface
    * users keep the reference's `create temporary function` workflow
    * (reference examples/.../DeltaTableStoreCDC.scala:107-109).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("cdc_col_parser",
      (value: String, op: String) => if (op == OpPut) value else null)
}
