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

  /** Eagerly convert a COMPOSED Column (functions-API tree) to a real
    * analyzable expression. `toExpression` defers via a
    * `ColumnNodeExpression` wrapper that only unwraps on the Dataset
    * analysis path — a function-registry builder needs the converted
    * tree up front or codegen meets an Unevaluable node. */
  def toAnalyzableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Resolved logical plan of a DataFrame (attribute references in
    * Columns taken from the frame line up with this plan's output). */
  def planOf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Build a DataFrame from a custom logical plan (package-private
    * `Dataset.ofRows`). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** True iff a string type still compares binary (UTF8_BINARY) —
    * `StringType.supportsBinaryEquality` is private[sql]; graft's
    * ci-collation rule needs it to wrap each comparison exactly once. */
  def comparesBinary(t: org.apache.spark.sql.types.DataType): Boolean =
    t match {
      case s: org.apache.spark.sql.types.StringType =>
        s.supportsBinaryEquality
      case _ => false
    }

  /** Register a custom Catalyst expression as a session-local SQL
    * function (`sessionState.functionRegistry` is package-private; this
    * is the classic-API registration path, same as
    * `SparkSessionExtensions.injectFunction` uses). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
