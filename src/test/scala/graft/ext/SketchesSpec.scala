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

  test("count-min estimates bound the exact heavy-hitter counts") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val exact = Sketches.heavyHittersExact(docs, 25)
      .as[(String, Long)].collect()
    assert(exact.length == 25)
    assert(exact.map(_._2).toSeq == exact.map(_._2).sortBy(-_).toSeq) // desc
    val totalTokens = docs
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")))
      .as[Int].collect().map(_.toLong).sum
    val est = Sketches.heavyHitterEstimates(docs, exact.map(_._1).toSeq,
      eps = 0.0001, confidence = 0.99)
    exact.foreach { case (term, freq) =>
      val e = est(term)
      assert(e >= freq, s"CMS under-counted $term: $e < $freq") // one-sided
      assert(e <= freq + (0.0001 * totalTokens).toLong + 1,
        s"CMS over-counted $term beyond eps*N: $e vs $freq (N=$totalTokens)")
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
