package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded interval (range) join: pairs of rows sharing equi-keys whose
  * timestamps fall within a fixed window of each other —
  * `r.ts ∈ [l.ts + lo, l.ts + hi)`.
  *
  * A plain inequality join forces Spark into BroadcastNestedLoopJoin (or
  * a per-key cross product), which is quadratic in the hot keys. Banding
  * restores an equi-join: bucket both sides by `width = hi - lo`
  * microseconds; any right row inside a left row's window lands in the
  * left window-start's bucket or the next one, so each left row probes
  * exactly two buckets and the join runs as a hash/sort-merge equi-join
  * on (keys, bucket) with the precise range re-checked after. Shuffle
  * volume is 2x the left side — linear, skew-safe under AQE, and the
  * standard plan for interval joins at fact-table scale.
  */
object RangeJoin {

  /** All (left, right) matches with `r.ts ∈ [l.ts + loMicros, l.ts + hiMicros)`.
    * Column names must be disjoint across the two sides except `keys`
    * (rename payload columns first). Output: left columns ++ right
    * non-key columns, one row per matching pair.
    */
  def bandedIntervalJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      loMicros: Long,
      hiMicros: Long): DataFrame = {
    require(hiMicros > loMicros, s"empty interval [$loMicros, $hiMicros)")
    val width = hiMicros - loMicros

    // Integral floorDiv on the long micros: `floor(x / w)` with Column
    // `/` goes through double division and loses exactness past 2^52
    // (pre-1826 / post-2112 timestamps could land one bucket off at a
    // window boundary). `(x - pmod(x, w)) div w` stays in long
    // arithmetic — pmod makes the numerator exactly divisible, so the
    // truncating `div` IS floor division, negative epochs included.
    def floorDivBucket(df: DataFrame, micros: Column): DataFrame =
      df.withColumn("__m", micros)
        .withColumn("__bucket", expr(s"(__m - pmod(__m, ${width}L)) div ${width}L"))
        .drop("__m")
    val r = floorDivBucket(right, unix_micros(col(rightTs)))
    val l = floorDivBucket(left, unix_micros(col(leftTs)) + loMicros)
      .withColumnRenamed("__bucket", "__b0")
      .withColumn("__bucket", explode(sequence(col("__b0"), col("__b0") + 1)))
      .drop("__b0")

    val lo = unix_micros(col(leftTs)) + loMicros
    val hi = unix_micros(col(leftTs)) + hiMicros
    val rMicros = unix_micros(col(rightTs))
    l.join(r, keys :+ "__bucket")
      .where(rMicros >= lo && rMicros < hi)
      .drop("__bucket")
  }
}
