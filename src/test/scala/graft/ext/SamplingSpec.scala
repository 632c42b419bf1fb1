package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("hashSample is deterministic and partitioning-independent") {
    val a = Sampling.hashSample(docs, col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(13), col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("hashSample fraction is approximately honored and monotone in fraction") {
    val n = docs.count().toDouble
    val k20 = Sampling.hashSample(docs, col("doc_id"), 0.2).count().toDouble
    assert(math.abs(k20 / n - 0.2) < 0.08, s"got ${k20 / n}")
    // a smaller fraction keeps a SUBSET (thresholds nest)
    val s10 = Sampling.hashSample(docs, col("doc_id"), 0.1)
      .select("doc_id").as[Long].collect().toSet
    val s20 = Sampling.hashSample(docs, col("doc_id"), 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(s10.subsetOf(s20))
    assert(Sampling.hashSample(docs, col("doc_id"), 0.0).count() == 0)
    assert(Sampling.hashSample(docs, col("doc_id"), 1.0).count() == n.toLong)
  }

  test("stratifiedSample returns exactly n per stratum (whole strata when smaller)") {
    val ev = graft.queries.Extensions.events(spark, sf0001)
      .select(col("event_type"), col("event_id"))
    val sizes = Sampling.stratifiedSample(ev, Seq("event_type"), col("event_id"), 25)
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    val full = ev.groupBy("event_type").count().as[(String, Long)].collect().toMap
    full.foreach { case (t, cnt) =>
      assert(sizes(t) == math.min(25L, cnt), s"stratum $t: ${sizes(t)} of $cnt")
    }
    // deterministic across partitionings
    val a = Sampling.stratifiedSample(ev, Seq("event_type"), col("event_id"), 25)
      .as[(String, Long)].collect().toSet
    val b = Sampling.stratifiedSample(ev.repartition(7), Seq("event_type"), col("event_id"), 25)
      .as[(String, Long)].collect().toSet
    assert(a == b)
  }
}
