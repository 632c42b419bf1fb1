package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the fixed-point GloVe trainer:
  *   - the descent law VERDICT round-9 item 2 asks for: the training
  *     loss is non-increasing per round (and actually moves);
  *   - bit-identical state under repartitioning (the determinism
  *     contract every oracle-checked op carries);
  *   - the scaladoc'd |v| < 2^24 overflow bound holds after training;
  *   - nearest-neighbor sanity over the LEARNED vectors via
  *     [[Similarity.bruteForceTopK]]: twin tokens that occur in
  *     identical contexts end up closer than tokens from disjoint
  *     contexts.
  */
class GloveSpec extends SparkSpec {
  import spark.implicits._

  // twins: "cat" and "dog" share the exact context profile {a@-1, b@+1,
  // x@-2, y@+2}; "sky"/"sea" live in a disjoint context vocabulary.
  private lazy val corpus = (0 until 6).flatMap { r =>
    Seq(
      (r * 4 + 0L, "x a cat b y"),
      (r * 4 + 1L, "x a dog b y"),
      (r * 4 + 2L, "p q sky r s"),
      (r * 4 + 3L, "p q sea r s"))
  }.toDF("doc_id", "text")

  private lazy val cooc = Text.cooccurrence(corpus, window = 2).localCheckpoint()
  private lazy val states = Glove.trainStates(cooc, dims = 4, rounds = 30, etaShift = 5)
  private lazy val losses = states.map(s => Glove.loss(cooc, s))

  test("training loss is non-increasing per round and strictly decreases overall") {
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"loss increased: $losses")
    }
    assert(losses.last < losses.head,
      s"training made no progress: $losses")
  }

  test("trained state is bit-identical under repartitioning") {
    val a = states.last.orderBy("side", "t", "k")
      .collect().map(_.toSeq).toSeq
    val b = Glove.train(cooc.repartition(7), dims = 4, rounds = 30, etaShift = 5)
      .orderBy("side", "t", "k").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("vector magnitudes stay inside the 2^24 overflow bound") {
    val maxAbs = states.last.agg(max(abs(col("v")))).head().getLong(0)
    assert(maxAbs < (1L << 24), s"|v| = $maxAbs breaches the documented bound")
  }

  test("learned vectors rank the identical-context twin nearest (bruteForceTopK)") {
    val toks = Seq("cat", "dog", "sky", "sea")
    val ids = toks.zipWithIndex.map { case (t, i) => t -> i.toLong }.toMap
    val vecs = states.last
      .where(col("side") === "w" && col("t").isin(toks: _*))
      .orderBy("t", "k")
      .collect()
      .groupBy(_.getString(1))
      .map { case (t, rows) =>
        (ids(t), rows.sortBy(_.getLong(2))
          .map(_.getLong(3).toFloat / (1L << Glove.Shift)))
      }.toSeq.toDF("vec_id", "embedding")
    val nn = Similarity.bruteForceTopK(vecs, Seq(ids("cat"), ids("sky")), k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nn(ids("cat")) == ids("dog"),
      s"cat's nearest learned neighbor is not its twin: $nn")
    assert(nn(ids("sky")) == ids("sea"),
      s"sky's nearest learned neighbor is not its twin: $nn")
  }
}
