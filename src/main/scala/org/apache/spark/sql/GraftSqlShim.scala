package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal private[sql] bridge for the graft engine's native Catalyst
  * expressions (the Column ⇄ Expression converters are private[sql] in
  * Spark 4; third-party Catalyst extensions conventionally shim them
  * from inside the package — same technique as Sedona / Frameless). */
object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
