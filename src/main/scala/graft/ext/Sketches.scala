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
}
