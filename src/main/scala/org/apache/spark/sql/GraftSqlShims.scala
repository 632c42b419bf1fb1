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
}
