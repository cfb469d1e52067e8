package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` / `col.expr` bridge (the
  * unified Column API is ColumnNode-based). This shim lives under
  * `org.apache.spark.sql` solely to re-expose the two package-private
  * converters for graft's custom Catalyst expressions — the supported
  * classic-API conversion, not a fork of any Spark internals. */
object bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
