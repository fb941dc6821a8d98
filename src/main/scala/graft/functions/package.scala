package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.ColumnBridge

/** Bridging helpers between the public Column API and Catalyst
  * expressions (Spark 4 moved Column onto ColumnNode; the classic
  * bridge is ExpressionUtils).
  */
package object functions {
  private[graft] def toColumn(e: Expression): Column = ColumnBridge.column(e)
  private[graft] def exprOf(c: Column): Expression = ColumnBridge.expression(c)
}
