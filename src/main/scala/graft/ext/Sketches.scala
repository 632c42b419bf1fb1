package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cardinality sketches: at 100 TB, exact distinct counts force a
  * full shuffle of the key; HyperLogLog++ (`approx_count_distinct`)
  * aggregates fixed-size sketches map-side instead. Both forms exposed so
  * callers trade exactness per use (the exact form backs the oracle
  * check; the approx form is the scale default, rsd-tunable).
  */
object Sketches {

  /** Exact distinct users per event type (shuffles user ids). */
  def distinctUsersExact(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n_users"))

  /** HLL++ distinct users per event type: fixed-size sketch per group
    * per partition, merged map-side. */
  def distinctUsersApprox(events: DataFrame, rsd: Double = 0.05): DataFrame =
    events.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd).as("n_users_approx"))

  /** Exact corpus heavy hitters: the k most frequent tokens, ties broken
    * on the token for a deterministic cut. Exact form = full token
    * shuffle (the oracle anchor); the scale path is
    * [[heavyHitterEstimates]]. */
  def heavyHittersExact(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("term"))
      .limit(k)

  /** Count–Min frequency estimates — the heavy-hitter scale path:
    * Spark's built-in `count_min_sketch` aggregate keeps one
    * `O(1/eps * ln(1/confidence))`-sized sketch per partition and
    * merges map-side (no token shuffle at all); estimates carry the
    * classic one-sided CMS guarantee (never under the true count,
    * over by at most eps * N with the given confidence). Returns the
    * estimated counts for `terms`. */
  def heavyHitterEstimates(docs: DataFrame, terms: Seq[String],
      eps: Double = 0.0001, confidence: Double = 0.99): Map[String, Long] = {
    val bin = docs.select(explode(split(col("text"), " ")).as("term"))
      .agg(expr(s"count_min_sketch(term, ${eps}d, ${confidence}d, 42)").as("cms"))
      .head().getAs[Array[Byte]]("cms")
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bin))
    terms.map(t => t -> cms.estimateCount(t)).toMap
  }

  /** Approximate quantiles per event type — the scale path of the exact
    * interpolated form (e24): `approx_percentile` keeps a bounded
    * Greenwald-Khanna sketch per group per partition and merges
    * map-side, where exact percentile must gather every value of a
    * group. `accuracy` trades sketch size for rank error (1/accuracy).
    * Output: (event_type, p25, p50, p75, p90). */
  def valueQuantilesApprox(events: DataFrame, accuracy: Int = 10000): DataFrame =
    events.groupBy("event_type")
      .agg(expr(
        s"approx_percentile(value, array(0.25, 0.5, 0.75, 0.9), $accuracy)")
        .as("qs"))
      .select(col("event_type"),
        col("qs")(0).as("p25"), col("qs")(1).as("p50"),
        col("qs")(2).as("p75"), col("qs")(3).as("p90"))
}
