package graft.ext

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("approx distinct within rsd tolerance of exact") {
    // events fixture has nanos timestamps; only user_id/event_type needed
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$sf0001/events.parquet")
      .select("event_type", "user_id")
    val exact = Sketches.distinctUsersExact(events)
      .as[(String, Long)].collect().toMap
    val approx = Sketches.distinctUsersApprox(events, rsd = 0.05)
      .as[(String, Long)].collect().toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n < 0.15, s"$k: approx=$a exact=$n")
    }
  }

  test("approx quantiles track the exact interpolated percentiles") {
    val ev = graft.queries.Extensions.events(spark, sf0001)
    val exact = graft.queries.Extensions.e24_quantiles(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(4))).toMap
    val approx = Sketches.valueQuantilesApprox(ev)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(4))).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    approx.foreach { case (k, (p50a, p90a)) =>
      val (p50e, p90e) = exact(k)
      // rank error 1/accuracy: observed values must sit within a few
      // percent of the exact interpolated quantile on this distribution
      assert(math.abs(p50a - p50e) / math.max(1.0, math.abs(p50e)) < 0.05,
        s"$k p50 approx=$p50a exact=$p50e")
      assert(math.abs(p90a - p90e) / math.max(1.0, math.abs(p90e)) < 0.05,
        s"$k p90 approx=$p90a exact=$p90e")
    }
  }
}
