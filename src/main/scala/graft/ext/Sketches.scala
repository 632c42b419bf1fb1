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
