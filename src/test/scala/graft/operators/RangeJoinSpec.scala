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

  test("bucket assignment stays exact past 2^52 micros (year 2290 timestamps)") {
    // Epoch micros here are ~1.01e16 > 2^53: double arithmetic cannot even
    // represent every value, so the old floor(x / w) double path misbuckets
    // boundary rows. The integral div path must equal brute force exactly.
    val base = ts("2290-06-01 00:00:00")
    assert(base.getTime * 1000L > (1L << 53)) // premise: beyond double-exact
    def shifted(sec: Long) = new Timestamp(base.getTime + sec * 1000)
    val l2 = (0L until 50L).map(i => ("k", shifted(i * 977), i))
      .toDF("user", "lt", "lid")
    // right rows hit exact window boundaries (lt + lo and lt + hi) and
    // one-micro offsets around them for a sample of lefts
    val r2 = (0L until 50L).flatMap { i =>
      val t = base.getTime + i * 977 * 1000
      Seq(-30 * 60 * 1000L, -30 * 60 * 1000L + 1, -1L, 0L, 1L).zipWithIndex.map {
        case (off, j) => ("k", new Timestamp(t + off), i * 10 + j)
      }
    }.toDF("user", "rt", "rid")
    val banded = RangeJoin.bandedIntervalJoin(l2, r2, Seq("user"),
        "lt", "rt", loMicros = -30 * Min, hiMicros = 0L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val brute = l2.join(r2, Seq("user"))
      .where(unix_micros(col("rt")) >= unix_micros(col("lt")) - 30 * Min &&
        unix_micros(col("rt")) < unix_micros(col("lt")))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(banded === brute)
    assert(banded.nonEmpty)
  }

  test("plan is an equi-join, not a nested loop") {
    val out = RangeJoin.bandedIntervalJoin(left, right, Seq("user"),
      "lt", "rt", loMicros = -30 * Min, hiMicros = 0L)
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"))
    assert(!physical.contains("CartesianProduct"))
  }
}
