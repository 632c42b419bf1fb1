package graft.ext

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("bpeMerges learns the classic merge sequence, greedy and tie-stable") {
    // aaab x2, ab x1. Round 1: (a,a) occurs 2x per aaab -> 4 (beats
    // (a,b) at 3); greedy merges only the FIRST of the overlapping run
    // (aaab -> [aa, a, b]). Round 2: (a,b) at 3. Round 3: (aa, ab) at 2.
    // Round 4: every word is one symbol -> training exhausts early.
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val m = Bpe.bpeMerges(docs, 3)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(m == Seq(
      (1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 2L)))
    val exhausted = Bpe.bpeMerges(docs, 10)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(exhausted == m) // stops when no pair occurs twice
  }

  test("bpeMerges on the fixture corpus is deterministic across partitionings") {
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = Bpe.bpeMerges(corpus, 6)
      .as[(Int, String, String, String, Long)].collect().toSeq
    val b = Bpe.bpeMerges(corpus.repartition(13), 6)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(a.nonEmpty && a == b)
    assert(a.map(_._1) == (1 to a.length)) // ordered rounds
  }
}
