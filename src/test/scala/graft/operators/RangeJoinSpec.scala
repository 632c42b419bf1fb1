package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val Min = 60L * 1000000 // a minute of microseconds

  private def left = Seq(
    ("u1", ts("2024-01-01 10:30:00"), 1L),
    ("u1", ts("2024-01-01 11:00:00"), 2L),
    ("u2", ts("2024-01-01 10:30:00"), 3L)
  ).toDF("user", "lt", "lid")

  private def right = Seq(
    ("u1", ts("2024-01-01 10:00:00"), 100L), // exactly lo for lid=1
    ("u1", ts("2024-01-01 10:29:59"), 101L), // just inside for lid=1
    ("u1", ts("2024-01-01 10:30:00"), 102L), // == lt: excluded (half-open)
    ("u1", ts("2024-01-01 10:59:00"), 103L), // inside for lid=2 only
    ("u2", ts("2024-01-01 10:29:00"), 104L)
  ).toDF("user", "rt", "rid")

  test("banded join matches exactly [lt+lo, lt+hi)") {
    val out = RangeJoin.bandedIntervalJoin(left, right, Seq("user"),
        "lt", "rt", loMicros = -30 * Min, hiMicros = 0L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(out === Set(
      (1L, 100L), // boundary: rt == lt + lo is included
      (1L, 101L),
      (2L, 102L), // 10:30 is 30 min before 11:00
      (2L, 103L),
      (3L, 104L)))
  }

  test("agrees with a brute-force inequality join") {
    val ev = graft.queries.Extensions.events(spark, sf0001)
    val a = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("lt"), col("event_id").as("lid"))
    val b = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("rt"), col("event_id").as("rid"))
    val banded = RangeJoin.bandedIntervalJoin(a, b, Seq("user_id"),
        "lt", "rt", loMicros = -10 * Min, hiMicros = 5 * Min)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val brute = a.join(b, Seq("user_id"))
      .where(unix_micros(col("rt")) >= unix_micros(col("lt")) - 10 * Min &&
        unix_micros(col("rt")) < unix_micros(col("lt")) + 5 * Min)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(banded === brute)
    assert(banded.nonEmpty)
  }

  test("empty interval is rejected, not silently empty") {
    intercept[IllegalArgumentException] {
      RangeJoin.bandedIntervalJoin(left, right, Seq("user"), "lt", "rt", 0L, 0L)
    }
  }

  test("forward-looking window ([0, +10min)) matches brute force") {
    val banded = RangeJoin.bandedIntervalJoin(left, right, Seq("user"),
        "lt", "rt", loMicros = 0L, hiMicros = 10 * Min)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val brute = left.join(right, Seq("user"))
      .where(unix_micros(col("rt")) >= unix_micros(col("lt")) &&
        unix_micros(col("rt")) < unix_micros(col("lt")) + 10 * Min)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(banded == brute && banded.nonEmpty)
  }

  test("plan is an equi-join, not a nested loop") {
    val out = RangeJoin.bandedIntervalJoin(left, right, Seq("user"),
      "lt", "rt", loMicros = -30 * Min, hiMicros = 0L)
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"))
    assert(!physical.contains("CartesianProduct"))
  }
}
