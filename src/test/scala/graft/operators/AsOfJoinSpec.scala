package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def trades = Seq(
    ("A", ts("2024-01-01 10:00:00"), 1L),
    ("A", ts("2024-01-01 10:05:00"), 2L),
    ("A", ts("2024-01-01 10:10:00"), 3L),
    ("B", ts("2024-01-01 10:03:00"), 4L),
    ("C", ts("2024-01-01 10:00:00"), 5L) // key with no quotes at all
  ).toDF("sym", "t", "trade_id")

  private def quotes = Seq(
    ("A", ts("2024-01-01 09:59:00"), 10.0),
    ("A", ts("2024-01-01 10:05:00"), 11.0), // exactly equal to trade 2
    ("A", ts("2024-01-01 10:07:00"), 12.0),
    ("B", ts("2024-01-01 10:04:00"), 20.0) // after B's only trade
  ).toDF("sym", "t", "px")

  test("backward picks latest quote at or before each trade") {
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
      .orderBy("trade_id")
      .select("trade_id", "px").as[(Long, Option[Double])].collect()
    assert(out === Seq(
      (1L, Some(10.0)), // 09:59 quote
      (2L, Some(11.0)), // equal timestamp matches
      (3L, Some(12.0)), // 10:07, not the older ones
      (4L, None),       // B's quote is later than the trade
      (5L, None)))      // no quotes for C
  }

  test("forward picks earliest quote at or after each trade") {
    val out = AsOfJoin.forward(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
      .orderBy("trade_id")
      .select("trade_id", "px").as[(Long, Option[Double])].collect()
    assert(out === Seq(
      (1L, Some(11.0)), // next at 10:05
      (2L, Some(11.0)), // equal timestamp matches
      (3L, None),       // nothing after 10:10
      (4L, Some(20.0)),
      (5L, None)))
  }

  test("tolerance nulls out stale matches but keeps the left row") {
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "t", Seq("px"),
        tolerance = Some(expr("INTERVAL 2 MINUTES")))
      .orderBy("trade_id")
      .select("trade_id", "px").as[(Long, Option[Double])].collect()
    assert(out === Seq(
      (1L, Some(10.0)), // 1 min old: within tolerance
      (2L, Some(11.0)), // exact match: age 0
      (3L, None),       // nearest quote is 3 min old: nulled, row kept
      (4L, None),
      (5L, None)))
  }

  test("matched timestamp column is exposed under the requested name") {
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "t", Seq("px"),
      matchedTs = "quote_t")
    assert(out.columns.toSeq === Seq("sym", "t", "trade_id", "quote_t", "px"))
    val row = out.where(col("trade_id") === 3).select("quote_t").as[Timestamp].head()
    assert(row === ts("2024-01-01 10:07:00"))
  }

  test("left rows with keys absent from the right side survive unmatched") {
    val loneLeft = Seq(("Z", ts("2024-01-01 09:00:00"), 9L)).toDF("sym", "t", "trade_id")
    val out = AsOfJoin.backward(loneLeft, quotes, Seq("sym"), "t", "t", Seq("px"))
    assert(out.count() == 1)
    assert(out.select("px").head().isNullAt(0))
  }

  test("plan shuffles once on the keys (no broadcast-nested-loop)") {
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin"))
    assert(!physical.contains("CartesianProduct"))
  }
}
