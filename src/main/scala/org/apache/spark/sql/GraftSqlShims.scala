package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Accessors for `private[sql]` internals the engine needs — the common
  * pattern for Spark extension libraries (a small object inside the
  * org.apache.spark.sql package). Kept to the minimum surface:
  * Column <-> Catalyst Expression conversion in Spark 4's
  * ColumnNode-based API. */
object GraftSqlShims {
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Eagerly convert a Column to its Catalyst expression tree.
    * [[expression]] returns a LAZY `ColumnNodeExpression` wrapper (the
    * Spark 4 ColumnNode indirection) whose catalyst children only
    * materialize during analysis — useless for pre-analysis inspection
    * (e.g. collecting referenced attribute names). This runs the
    * converter now. */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a native expression in the session's FunctionRegistry so
    * it is callable from SQL text (runtime twin of the
    * `spark.sql.extensions` injection path). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
