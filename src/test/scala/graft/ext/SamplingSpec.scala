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

  test("assignSplits: total partition, growth-stable, ~weight proportions") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = Sampling.assignSplits(docs, col("doc_id"), splits)
      .select("doc_id", "split").as[(Long, String)].collect()
    // every row gets exactly one split; proportions near the weights
    assert(assigned.length == docs.count())
    val byS = assigned.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    assert(byS.keySet == Set("train", "val", "test"))
    assert(byS("train") / assigned.length > 0.7)
    assert(byS("val") / assigned.length < 0.2)
    // growth stability: assignment on a SUBSET matches the full corpus
    // row-for-row (membership depends only on the key hash)
    val sub = Sampling.assignSplits(docs.where(col("doc_id") < 100),
        col("doc_id"), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = assigned.toMap
    assert(sub.forall { case (id, s) => full(id) == s } && sub.nonEmpty)
    // hash-interval boundaries partition the space exactly
    val b = Sampling.splitBounds(splits)
    assert(b.last._2 == (1L << Sampling.HashBits) && b.map(_._2) == b.map(_._2).sorted)
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

  test("weightedSample: driver replay, weight bias, div semantics, determinism") {
    // pin Spark's integral `div` on negative numerators: trunc toward
    // zero, exactly DuckDB's // ((-7)//2 = -3, verified)
    assert(spark.sql("SELECT -7 div 2 AS d").as[Long].head() == -3L)
    // 1000 keys, 50 of them 50x heavier
    val rows = (0L until 1000L).map(i => (i, if (i % 20 == 0) 50L else 1L))
    val df = rows.toDF("doc_id", "w")
    val out = Sampling.weightedSample(df, col("doc_id"), col("w"), 100)
      .select("doc_id", "w", "es_fp").as[(Long, Long, Long)].collect()
    assert(out.length == 100)
    // exact driver replay of the quantized A-Res race
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) + 1L
    }
    def es(id: Long, w: Long): Long = {
      val uu = u(id)
      val e = 63 - java.lang.Long.numberOfLeadingZeros(uu)
      val m = if (e >= 6) uu >> (e - 6) else uu << (6 - e)
      val num = (64L * e + m - 64L - 3840L) * (1L << 20)
      num / w // both engines truncate toward zero
    }
    val expect = rows.map { case (id, w) => (id, w, es(id, w)) }
      .sortBy { case (id, _, e) => (-e, id) }.take(100)
      .sortBy(_._1)
    assert(out.sortBy(_._1).toSeq == expect)
    // the 50 heavy keys dominate the sample (w-proportional inclusion)
    val heavy = out.count(_._2 == 50L)
    assert(heavy >= 40, s"heavy keys under-represented: $heavy/50")
    // deterministic under partitioning
    val again = Sampling.weightedSample(df.repartition(13), col("doc_id"), col("w"), 100)
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.map(_._1).toSet)
    // zero/negative weights are excluded, never divided by
    val z = Sampling.weightedSample(
      Seq((1L, 0L), (2L, -3L), (3L, 5L)).toDF("doc_id", "w"),
      col("doc_id"), col("w"), 10)
    assert(z.select("doc_id").as[Long].collect().toSeq == Seq(3L))
  }

  test("weightedMix keeps the binding group whole, rates the rest, drops the unweighted") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val weights = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25)
    val mixed = Sampling.weightedMix(docs, col("source"), col("doc_id"), weights)
    val bySrc = mixed.groupBy("source").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    // groups outside the weight map are gone
    assert(bySrc.keySet == weights.keySet.intersect(full.keySet))
    // uniform group sizes -> src0 is the binding group: kept whole
    assert(bySrc("src0") == full("src0"))
    // the rated groups land near half of src0's size (rate 0.5,
    // Bernoulli over small strata — allow wide but bounded slack)
    Seq("src1", "src2").foreach { g =>
      assert(bySrc.getOrElse(g, 0L) < full(g),
        s"$g should be downsampled: ${bySrc.get(g)} of ${full(g)}")
    }
    // membership is key-determined: partitioning-independent
    val again = Sampling.weightedMix(docs.repartition(13),
      col("source"), col("doc_id"), weights)
      .select("doc_id").as[Long].collect().toSet
    assert(again == mixed.select("doc_id").as[Long].collect().toSet)
    // weight normalization: scaled weights give the identical sample
    val scaled = Sampling.weightedMix(docs, col("source"), col("doc_id"),
      weights.map { case (g, w) => g -> w * 8 })
      .select("doc_id").as[Long].collect().toSet
    assert(scaled == again)
  }

  test("weightedMixFp: binding group whole, equals weightedMix on a binary fixture, key-determined") {
    // A: 16 rows, B: 32 rows, equal fixed-point weights -> exact
    // power-of-two thresholds on BOTH paths (q_A = 2^56 binds, thr_B =
    // 2^59), so the double-rate and fixed-point-rate mixers must agree
    // bit-for-bit on membership.
    val d = (0L until 48L).map(i => (i, if (i % 3 == 0) "A" else "B"))
      .toDF("doc_id", "source")
    val wf = Seq(("A", 1L << 20), ("B", 1L << 20)).toDF("source", "mix_fp")
    val ids = Sampling.weightedMixFp(d, col("source"), col("doc_id"), wf)
      .select("doc_id").as[Long].collect().toSet
    assert((0L until 48L).filter(_ % 3 == 0).forall(ids.contains), "binding group cut")
    val viaMap = Sampling.weightedMix(d, col("source"), col("doc_id"),
        Map("A" -> 0.5, "B" -> 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(ids == viaMap)
    // membership is key-determined: partitioning-independent
    val again = Sampling.weightedMixFp(d.repartition(7),
        col("source"), col("doc_id"), wf)
      .select("doc_id").as[Long].collect().toSet
    assert(again == ids)
    // groups absent from the weights frame are dropped
    val onlyA = Sampling.weightedMixFp(d, col("source"), col("doc_id"),
        Seq(("A", 1L << 20)).toDF("source", "mix_fp"))
      .select("doc_id").as[Long].collect().toSet
    assert(onlyA == (0L until 48L).filter(_ % 3 == 0).toSet)
  }

  test("temperatureWeights: hand-exact fixed point, flattening raises the rare source") {
    // A: 3 docs x 100 tokens = 300; B: 1 doc x 100 tokens. t = 400.
    def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val d = Seq((1L, "A", doc(100)), (2L, "A", doc(100)),
      (3L, "A", doc(100)), (4L, "B", doc(100)))
      .toDF("doc_id", "source", "text")
    val m1 = Sampling.temperatureWeights(d, col("source"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // p_fp = (tokens * 2^20) div 400; w_fp = floor(sqrt(p_fp * 2^20));
    // mix_fp = (w_fp * 2^20) div (908093 + 524288) — integer-exact
    assert(m1("A") == ((3L, 300L, 786432L, 908093L, 664770L)))
    assert(m1("B") == ((1L, 100L, 262144L, 524288L, 383805L)))
    // Flattening law: B's mixture share rises above its raw 1/4 token
    // share while A keeps the majority (no inversion).
    assert(m1("B")._5 > m1("B")._3 && m1("A")._5 > m1("B")._5)

    // alpha = 1/4 (two sqrt applications) flattens further, same laws.
    val m2 = Sampling.temperatureWeights(d, col("source"), sqrtApplications = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(4), r.getLong(5)))).toMap
    assert(m2("A") == ((975809L, 595837L)))
    assert(m2("B") == ((741455L, 452738L)))
    assert(m2("B")._2 > m1("B")._5)
  }

  test("budgetSelect == the global greedy window (law), at several budgets") {
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"),
        graft.ext.Text.qualityScoreCol.as("q"))
    val total = base.agg(sum("n")).as[Long].head()
    // brute-force reference: one global running-sum window
    def brute(budget: Long): Set[Long] = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("q").desc, col("doc_id"))
      base.withColumn("c", sum("n").over(w)).where(col("c") <= budget)
        .select("doc_id").as[Long].collect().toSet
    }
    Seq(0L, 500L, 12000L, total - 1, total, total + 10) .foreach { b =>
      val got = Sampling.budgetSelect(base, col("q"), col("n"), col("doc_id"), b)
        .select("doc_id").as[Long].collect().toSet
      assert(got == brute(b), s"budget $b: decomposed != global greedy")
    }
    // partitioning independence
    val a = Sampling.budgetSelect(base.repartition(11), col("q"), col("n"),
      col("doc_id"), 9000L).select("doc_id").as[Long].collect().toSet
    assert(a == brute(9000L))
  }

  test("dsirScores ranks target-like docs above unrelated ones, deterministically") {
    val target = Seq((100L, "spark shuffle join spark shuffle join spark shuffle"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "spark shuffle join spark shuffle plan"),   // target-like
      (2L, "gardening tulips roses watering can soil"), // unrelated
      (3L, "spark shuffle something else entirely now")) // partial match
      .toDF("doc_id", "text")
    val scores = Sampling.dsirScores(raw, target, n = 2, buckets = 64)
      .as[(Long, Long)].collect().toMap
    assert(scores.keySet == Set(1L, 2L, 3L))
    assert(scores(1L) > scores(2L))
    assert(scores(1L) > scores(3L) && scores(3L) > scores(2L))
    // partitioning independence (pure integer arithmetic, no seeds)
    val again = Sampling.dsirScores(raw.repartition(7), target.repartition(3),
      n = 2, buckets = 64).as[(Long, Long)].collect().toMap
    assert(again == scores)
  }

  test("curriculumOrder: equal phases, contiguous ord, bucket-choice invariance") {
    val scored = (1L to 12L).map(i => (i, i * 100L)).toDF("doc_id", "m")
    def run(bucket: org.apache.spark.sql.Column) =
      Sampling.curriculumOrder(scored, col("m"), bucket, phases = 4)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val out = run(expr("difficulty div 400"))
    // difficulty carried through; every doc present exactly once
    assert(out.map(_._1).toSeq == (1L to 12L))
    assert(out.forall { case (id, d, _, _) => d == id * 100L })
    // 4 equal-population phases, assigned by difficulty rank
    val byPhase = out.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    assert(byPhase.keySet == Set(0L, 1L, 2L, 3L))
    assert(byPhase(0L) == Set(1L, 2L, 3L) && byPhase(3L) == Set(10L, 11L, 12L))
    // ord is the permutation 1..n with phases occupying contiguous runs
    assert(out.map(_._4).sorted.toSeq == (1L to 12L))
    assert(byPhase.toSeq.sortBy(_._1).flatMap { case (p, ids) =>
      out.filter(r => ids(r._1)).map(_._4)
    }.forall(_ >= 1L)) // shape check below pins the real contiguity
    val ordRanges = out.groupBy(_._3).view
      .mapValues(rs => (rs.map(_._4).min, rs.map(_._4).max)).toMap
    assert((0L to 3L).map(ordRanges).toSeq ==
      Seq((1L, 3L), (4L, 6L), (7L, 9L), (10L, 12L)))
    // within a phase the order follows the md5 shuffle key, not the id
    val p0 = out.filter(_._3 == 0L).sortBy(_._4).map(_._1).toSeq
    def skey(id: Long) =
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString)
          .substring(0, 15), 16)
    assert(p0 == Seq(1L, 2L, 3L).sortBy(skey))
    // the bucket clamp is plan-only: a different monotone coarsening
    // yields the identical schedule
    assert(run(expr("difficulty div 700")).toSeq == out.toSeq)
    // partitioning independence
    assert(Sampling.curriculumOrder(scored.repartition(5), col("m"),
        expr("difficulty div 400"), phases = 4)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq == out.toSeq)
  }

  test("doremiWeights: hard source up-weighted, extreme ratio clamps, hand replay") {
    val S = graft.ext.Retrieval.Scale
    // A: very easy (below the 1/8 floor), B: ~1.3x pool, C: absurd
    // (tiny mass, way past the 8x ceiling)
    val scored = Seq(
      (1L, 500L, 150L), (2L, 500L, 150L),     // A: mean 300 milli
      (3L, 500L, 2000L), (4L, 500L, 2000L),   // B: mean 4000 milli
      (5L, 10L, 2000L)                        // C: mean 200000 milli
    ).toDF("doc_id", "n_bigrams", "surprisal8")
    val docs = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"), (5L, "C"))
      .toDF("doc_id", "source")
    val out = Sampling.doremiWeights(docs, scored, col("source"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // driver-side integer replay of the contract
    val tb = 2010L
    val poolMilli = (300L + 4000 + 2000) * 1000 / tb
    def leg(nb: Long, s8: Long) = {
      val mean = s8 * 1000 / nb
      val share = math.max(nb * S / tb, 1L)
      val ratio = math.min(math.max(mean * S / poolMilli, S / 8), 8L * S)
      val w = share * math.floor(math.sqrt((ratio * 65536L).toDouble)).toLong / (1L << 18)
      (mean, ratio, w)
    }
    val legs = Map("A" -> leg(1000, 300), "B" -> leg(1000, 4000), "C" -> leg(10, 2000))
    val sw = legs.values.map(_._3).sum
    legs.foreach { case (src, (mean, ratio, w)) =>
      val (_, nd, nb, m, r, wf, mix) = out(src)
      assert(m == mean && r == ratio && wf == w,
        s"$src: got ($m,$r,$wf) want ($mean,$ratio,$w)")
      assert(mix == math.max(w * S / sw, 1L))
      assert(nd == (if (src == "C") 1L else 2L) && nb == (if (src == "C") 10L else 1000L))
    }
    // the reweighting story: same share, harder source gets more weight
    assert(out("B")._6 > out("A")._6)
    // the clamps bind exactly where designed
    assert(out("A")._5 == S / 8 && out("C")._5 == 8L * S)
    assert(out("B")._5 > S / 8 && out("B")._5 < 8L * S)
  }
}
