package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the single closest right row at
  * or before (backward) / at or after (forward) the left timestamp,
  * within the same equi-key group.
  *
  * Spark has no native as-of join, and the naive formulation (inequality
  * join + per-left argmax) degenerates to a per-key cross product. This
  * implementation is the union-merge form: tag both sides, union, and do
  * ONE shuffle on the keys with a single sort by (ts, side); a running
  * `last(right, ignoreNulls)` window then carries the latest right row
  * forward onto every left row. Cost is O(n log n) per key group and one
  * exchange total — the plan that survives both sides being 100 TB fact
  * streams (no broadcast requirement, no quadratic pair blowup).
  *
  * Right rows must be unique per (keys, ts) — pre-aggregate the right
  * side otherwise (which of several equal-timestamp rows "the" match is
  * undefined in any engine; DuckDB's ASOF has the same contract).
  */
object AsOfJoin {

  /** Backward as-of (the common "most recent fact at or before"):
    * left ts >= right ts, nearest wins; equal timestamps match.
    *
    * @param keys        equi-join columns present on both sides
    * @param leftTs      timestamp column on the left
    * @param rightTs     timestamp column on the right
    * @param rightPayload right columns to attach (null when no match)
    * @param matchedTs   output name for the matched right timestamp
    * @param tolerance   max age of the match as a Spark interval Column
    *                    (e.g. `expr("INTERVAL 30 MINUTES")`); older
    *                    matches are nulled out (left row kept)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      matchedTs: String = "matched_ts",
      tolerance: Option[Column] = None): DataFrame =
    run(left, right, keys, leftTs, rightTs, rightPayload, matchedTs, tolerance,
      forward = false)

  /** Forward as-of: left ts <= right ts, nearest wins (equal ts match). */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      matchedTs: String = "matched_ts",
      tolerance: Option[Column] = None): DataFrame =
    run(left, right, keys, leftTs, rightTs, rightPayload, matchedTs, tolerance,
      forward = true)

  private def run(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      matchedTs: String,
      tolerance: Option[Column],
      forward: Boolean): DataFrame = {

    val leftCols = left.columns.toSeq
    // Schemas for the null literals on the opposite side of the union.
    val lStructType = left.select(struct(leftCols.map(col): _*)).schema.head.dataType
    val rStruct = struct(col(rightTs).as(matchedTs) +: rightPayload.map(col): _*)
    val rStructType = right.select(rStruct).schema.head.dataType

    val taggedRight = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__t"),
        lit(0).as("__side"),
        lit(null).cast(lStructType).as("__l"),
        rStruct.as("__r")): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__t"),
        lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(rStructType).as("__r")): _*)

    // Sort so that, scanning toward the current left row, the nearest
    // eligible right row is the LAST one seen: ascending ts for backward,
    // descending for forward. `__side` breaks ts ties right-before-left,
    // which is exactly "equal timestamps match".
    val ord =
      if (forward) Seq(col("__t").desc, col("__side").asc)
      else Seq(col("__t").asc, col("__side").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = taggedRight.unionByName(taggedLeft)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val withinTol = tolerance match {
      case None => matched
      case Some(tol) =>
        val age =
          if (forward) col(s"__m.$matchedTs") - col("__t")
          else col("__t") - col(s"__m.$matchedTs")
        matched.withColumn("__m",
          when(age <= tol, col("__m")).otherwise(lit(null).cast(rStructType)))
    }

    val outRight = (matchedTs +: rightPayload).map(c => col(s"__m.$c").as(c))
    withinTol.select(leftCols.map(c => col(s"__l.$c").as(c)) ++ outRight: _*)
  }
}
