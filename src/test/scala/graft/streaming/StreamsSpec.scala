package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming transforms: batch/stream parity via MemoryStream — the same
  * transform function produces the same aggregates in both modes. */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val eventRows = Seq(
    (1L, ts("2024-01-01 10:05:00"), 7L, "click", 1.0),
    (2L, ts("2024-01-01 10:20:00"), 7L, "click", 2.0),
    (3L, ts("2024-01-01 10:59:00"), 8L, "view", 3.0),
    (4L, ts("2024-01-01 11:01:00"), 7L, "click", 4.0),
    (5L, ts("2024-01-01 12:30:00"), 7L, "click", 5.0))

  private lazy val batch = eventRows
    .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("tumblingCounts in batch: hour buckets") {
    val out = Streams.tumblingCounts(batch).orderBy("window_start", "event_type")
      .select(col("window_start").cast("string"), col("event_type"), col("cnt"))
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01 10:00:00", "click", 2L),
      ("2024-01-01 10:00:00", "view", 1L),
      ("2024-01-01 11:00:00", "click", 1L),
      ("2024-01-01 12:00:00", "click", 1L)))
  }

  test("sessionize in batch: 30 min gap splits sessions") {
    val out = Streams.sessionize(batch).orderBy("user_id", "session_start")
      .select(col("user_id"), col("n_events"))
      .as[(Long, Long)].collect().toSeq
    // user 7: 10:05,10:20,11:01 merge (gaps 15m, 41m -> 41m>30m splits!)
    //   sessions: {10:05,10:20}, {11:01}, {12:30}; user 8: {10:59}
    assert(out == Seq((7L, 2L), (7L, 1L), (7L, 1L), (8L, 1L)))
  }

  test("streaming tumblingCounts over MemoryStream matches batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val stream = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val agg = Streams.tumblingCounts(Streams.withWatermark(stream, "1 minute"))
    val q = agg.writeStream
      .format("memory").queryName("tumbling_test").outputMode("complete").start()
    try {
      mem.addData(eventRows: _*)
      q.processAllAvailable()
      val got = spark.table("tumbling_test")
        .orderBy("window_start", "event_type")
        .select(col("window_start").cast("string"), col("event_type"), col("cnt"))
        .as[(String, String, Long)].collect().toSeq
      val want = Streams.tumblingCounts(batch).orderBy("window_start", "event_type")
        .select(col("window_start").cast("string"), col("event_type"), col("cnt"))
        .as[(String, String, Long)].collect().toSeq
      assert(got == want)
    } finally q.stop()
  }
}
