package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val label = when(col("lang") === "en", 1L).otherwise(-1L)

  test("perceptron separates a linearly separable corpus exactly") {
    // Disjoint vocabularies -> binary features separate in one pass;
    // the averaged model must classify every doc correctly.
    val corpus = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, s"alpha beta gamma t$i", 1L)
      else (i, s"delta epsilon zeta t$i", -1L)
    }.toDF("doc_id", "text", "y")
    val w = Classify.perceptronTrain(corpus, col("y"), rounds = 4,
      buckets = 512, n = 1)
    val scored = Classify.score(corpus, w, buckets = 512, n = 1)
      .join(corpus.select("doc_id", "y"), "doc_id")
    assert(scored.where(col("pred") =!= col("y")).count() == 0)
  }

  test("training is deterministic and partitioning-independent") {
    val a = Classify.perceptronTrain(docs, label, rounds = 3, buckets = 1024)
      .as[(Long, Long)].collect().toMap
    val b = Classify.perceptronTrain(docs.repartition(13), label, rounds = 3,
      buckets = 1024).as[(Long, Long)].collect().toMap
    assert(a == b && a.nonEmpty)
  }

  test("fixture model beats the majority class on its training labels") {
    val w = Classify.perceptronTrain(docs, label, rounds = 8, buckets = 4096)
    val scored = Classify.score(docs, w, buckets = 4096)
      .join(docs.select(col("doc_id"), label.as("y")), "doc_id")
    val n = scored.count().toDouble
    val acc = scored.where(col("pred") === col("y")).count() / n
    val majority = math.max(
      docs.where(label === 1L).count(), docs.where(label =!= 1L).count()) / n
    assert(acc > majority, s"acc $acc <= majority $majority")
  }

  test("averaged model is the sum of round-end weights (law vs manual unroll)") {
    val one = Classify.perceptronTrain(docs, label, rounds = 1,
      buckets = 256, averaged = false).as[(Long, Long)].collect().toMap
    val avg1 = Classify.perceptronTrain(docs, label, rounds = 1,
      buckets = 256).as[(Long, Long)].collect().toMap
    // with one round, averaged == last iterate
    assert(one == avg1)
    // round 1 from w=0 updates on EVERY doc: w1 = sum_d y_d x_d
    val manual = Classify.hashedFeatures(docs, 256)
      .join(docs.select(col("doc_id").as("_id"), label.as("_y")), "_id")
      .groupBy("_b").agg(sum("_y").as("w"))
      .as[(Long, Long)].collect().toMap
    assert(one == manual)
  }

  test("evaluate: confusion counts partition the corpus and sweep monotonically") {
    val w = Classify.perceptronTrain(docs, label, rounds = 4, buckets = 4096)
    val ts = Seq(Long.MinValue, -100L, 0L, 1L, 100L, Long.MaxValue)
    val ev = Classify.evaluate(docs, w, label, ts, buckets = 4096)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (t, tp, fp, tn, fn) => t -> ((tp, fp, tn, fn)) }.toMap
    val n = docs.count()
    assert(ev.keySet == ts.toSet)
    // every threshold partitions the corpus
    ev.values.foreach { case (tp, fp, tn, fn) => assert(tp + fp + tn + fn == n) }
    // at -inf everything is positive; at +inf nothing is
    val nPos = docs.where(label === 1L).count()
    assert(ev(Long.MinValue) == ((nPos, n - nPos, 0L, 0L)))
    assert(ev(Long.MaxValue) == ((0L, 0L, n - nPos, nPos)))
    // predicted-positive count is non-increasing in the threshold
    val pp = ts.map(t => ev(t)._1 + ev(t)._2)
    assert(pp == pp.sorted.reverse)
    // threshold 1 row equals score()'s pred=1 confusion
    val scored = Classify.score(docs, w, buckets = 4096)
      .join(docs.select(col("doc_id"), label.as("y")), "doc_id")
    val tp1 = scored.where(col("pred") === 1L && col("y") === 1L).count()
    assert(ev(1L)._1 == tp1)
  }

  test("bias-only degenerate: empty text still classifies via the bias bucket") {
    val corpus = (0L until 10L).map(i => (i, "", if (i < 7) 1L else -1L))
      .toDF("doc_id", "text", "y")
    val w = Classify.perceptronTrain(corpus, col("y"), rounds = 2, buckets = 64)
    val scored = Classify.score(corpus, w, buckets = 64)
    // all docs share the single bias feature -> uniform majority vote
    assert(scored.select("pred").distinct().count() == 1)
  }
}
