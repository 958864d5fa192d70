package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the package-private Column<->Expression conversions of the
  * Spark 4 classic module, so graft can expose custom Catalyst expressions
  * as user-facing Columns (the standard extension-library pattern). */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
