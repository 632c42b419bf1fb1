package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Event-stream transforms written once and usable in both batch and
  * Structured Streaming mode (the transforms are plain logical-plan
  * builders; in streaming mode add a watermark first).
  *
  * The reference engine is strictly request/response OLTP with no
  * streaming surface (SURVEY.md §2.2) — this module is the extension
  * E4 layer over the `events` fixture table.
  */
object Streams {

  /** Attach an event-time watermark (streaming mode only; a no-op plan
    * decoration in batch). */
  def withWatermark(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)

  /** Tumbling-window counts per event type.
    * Output: (window_start, event_type, cnt, min_value, max_value). */
  def tumblingCounts(events: DataFrame, duration: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), duration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("cnt"), col("min_value"), col("max_value"))

  /** Sliding-window counts per event type (window `duration`, sliding
    * every `slide`). Windows align to the epoch, matching
    * `time_bucket`-based SQL oracles.
    * Output: (window_start, event_type, cnt). */
  def slidingCounts(events: DataFrame, duration: String = "1 hour",
      slide: String = "15 minutes"): DataFrame =
    events.groupBy(window(col("ts"), duration, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("event_type"), col("cnt"))

  /** Session windows per user: events within `gap` of each other merge
    * into one session. Works in batch and streaming (streaming requires
    * the watermark). Output: (user_id, session_start, session_end,
    * n_events). */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Arbitrary per-key streaming state via `mapGroupsWithState`: a
    * running (events, value-sum) accumulator per user that survives
    * across triggers — the custom-state surface Structured Streaming
    * exposes beyond windowed aggregation. Update output mode; state
    * never expires (attach a timeout for production eviction). */
  def runningUserTotals(events: DataFrame): Dataset[UserTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").as[Long], col("value").as[Double])
      .groupByKey(_._1)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout) {
        case (userId, rows, state) =>
          val (n0, sum0) =
            if (state.exists) (state.get.n_events, state.get.value_sum)
            else (0L, 0.0)
          var n = n0
          var sum = sum0
          rows.foreach { case (_, v) => n += 1; sum += v }
          val updated = UserTotal(userId, n, sum)
          state.update(updated)
          updated
      }
  }

  final case class UserTotal(user_id: Long, n_events: Long, value_sum: Double)
}
