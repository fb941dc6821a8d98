package graft.streaming

import org.apache.spark.sql.SparkSession

/** Entry point for reference-shaped SQL scripts (CREATE TABLE ... USING
  * <graft source> OPTIONS(..., output.mode ...); SET ...; INSERT INTO ...)
  * — see [[org.apache.spark.sql.graftshim.StreamingInsert]].
  */
object GraftSql {
  def runScript(spark: SparkSession, script: String): Unit =
    org.apache.spark.sql.graftshim.StreamingInsert.runScript(spark, script)
}
