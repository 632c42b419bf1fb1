package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("globalRank equals a plain global sort position; bucket choice is plan-only") {
    val df = Seq((1L, 30L), (2L, 10L), (3L, 20L), (4L, 10L), (5L, 40L))
      .toDF("doc_id", "s")
    def ranks(bucket: org.apache.spark.sql.Column): Map[Long, Long] =
      Agreement.globalRank(df, bucket, Seq(col("s").asc, col("doc_id").asc))
        .select("doc_id", "_rk").as[(Long, Long)].collect().toMap
    val want = Map(2L -> 1L, 4L -> 2L, 3L -> 3L, 1L -> 4L, 5L -> 5L)
    assert(ranks(expr("s div 15")) == want)
    // any monotone coarsening — including the degenerate one-bucket
    // and the finest per-value bucketing — yields identical positions
    assert(ranks(lit(0L)) == want)
    assert(ranks(col("s")) == want)
    // partitioning independence
    val rp = Agreement.globalRank(df.repartition(7), expr("s div 15"),
      Seq(col("s").asc, col("doc_id").asc))
      .select("doc_id", "_rk").as[(Long, Long)].collect().toMap
    assert(rp == want)
  }

  test("spearman: perfect agreement 1.0, perfect reversal -1.0, hand value") {
    def ranked(rs: (Long, Long)*) = rs.toSeq.toDF("doc_id", "_rk")
    val a = ranked(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L)
    val rev = ranked(1L -> 4L, 2L -> 3L, 3L -> 2L, 4L -> 1L)
    val out = Agreement.spearman(Seq("a" -> a, "a2" -> a, "rev" -> rev))
      .select("scorer_a", "scorer_b", "spearman")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("a", "a2")) == 1.0)
    assert(out(("a", "rev")) == -1.0)
    // one swapped neighbor pair: d^2 = 2, rho = 1 - 12/(4*15) = 0.8
    val swap = ranked(1L -> 2L, 2L -> 1L, 3L -> 3L, 4L -> 4L)
    val rho = Agreement.spearman(Seq("a" -> a, "s" -> swap))
      .select("spearman").as[Double].head()
    assert(rho == 0.8)
  }

  test("kappa: hand-exact 2x2, symmetry complements, degenerate rater scores 0") {
    def rater(fs: (Long, Long)*) = fs.toSeq.toDF("doc_id", "flag")
    // confusion: both_pos=2, both_neg=1, only_a=1, only_b=0 over n=4
    // po = 3/4; pe = (3*2 + 1*2)/16 = 1/2; kappa = (3/4 - 1/2)/(1/2) = 1/2
    val a = rater(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L)
    val b = rater(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L)
    val row = Agreement.kappa(Seq("a" -> a, "b" -> b)).collect().head
    assert(row.getLong(2) == 4L)
    assert((row.getLong(3), row.getLong(4), row.getLong(5), row.getLong(6))
      == ((2L, 1L, 1L, 0L)))
    assert(row.getDouble(7) == 0.5)
    // identical raters: kappa 1; opposite raters: kappa -1 (balanced)
    val n1 = rater(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L)
    assert(Agreement.kappa(Seq("a" -> a, "c" -> a))
      .select("kappa").as[Double].head() == 1.0)
    assert(Agreement.kappa(Seq("a" -> rater(1L -> 1L, 2L -> 0L),
        "d" -> rater(1L -> 0L, 2L -> 1L)))
      .select("kappa").as[Double].head() == -1.0)
    // constant rater => chance-only => 0.0 by the degenerate guard
    val const = rater(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L)
    assert(Agreement.kappa(Seq("a" -> a, "k" -> const))
      .select("kappa").as[Double].head() == 0.0)
    assert(n1.count() == 4) // keep the fixture referenced
  }
}
