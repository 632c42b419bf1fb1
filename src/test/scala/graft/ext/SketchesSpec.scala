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
}
