package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column a ColumnNode wrapper and gated the
  * Expression↔Column converters behind `private[sql]`. This bridge —
  * placed in an `org.apache.spark.sql` subpackage, the sanctioned pattern
  * for third-party Catalyst extensions — re-exposes exactly the two
  * conversions custom expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
