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

  test("bpeTokenCounts: merges compress counts, bounded by chars and words") {
    val docs = Seq((1L, "aaab aaab ab"), (2L, "ab aaab")).toDF("doc_id", "text")
    // 0 merges impossible (rounds >= 1); after 1 merge (a,a):
    // aaab -> [aa,a,b] (3), ab -> [a,b] (2): doc1 = 3+3+2, doc2 = 2+3
    val one = Bpe.bpeTokenCounts(docs, 1).as[(Long, Long)].collect().toMap
    assert(one == Map(1L -> 8L, 2L -> 5L))
    // after exhaustive merging every word is one token
    val full = Bpe.bpeTokenCounts(docs, 10).as[(Long, Long)].collect().toMap
    assert(full == Map(1L -> 3L, 2L -> 2L))
  }

  test("wordpiece likelihood argmax prefers exclusive pairs over frequent ones") {
    // "that" x4, "qz" x2. Pair (q,z) occurs only 2x but q and z occur
    // NOWHERE else: s8(q,z) = 8 - 8 - 8 = -8 beats every "that" pair
    // (best -16), so WordPiece merges (q,z) first while BPE's frequency
    // argmax picks (a,t) (the lexicographic winner of the 4-count tie).
    // Full hand-traced schedule: (q,z) -> (h,a) -> (ha,t) [tie with
    // (t,ha) broken lexicographically] -> (t,hat), then exhausted.
    val docs = Seq((1L, "that that that that qz qz")).toDF("doc_id", "text")
    val wp = Bpe.bpeMerges(docs, 8, likelihood = true)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(wp == Seq(
      (1, "q", "z", "qz", 2L),
      (2, "h", "a", "ha", 4L),
      (3, "ha", "t", "hat", 4L),
      (4, "t", "hat", "that", 4L)))
    val bpe = Bpe.bpeMerges(docs, 1)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(bpe.head == ((1, "a", "t", "at", 4L)))
  }

  test("tokenizer fertility scoreboard: three rows, consistent with the per-doc queries") {
    import org.apache.spark.sql.functions._
    val sb = graft.SparkEntry.queries("e85_tokenizer_fertility")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(sb.keySet == Set("bpe", "unigram", "wordpiece"))
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    val nWords = corpus
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0).count()
    sb.values.foreach { case (nw, nt, f) =>
      assert(nw == nWords)
      // every word is at least one piece; 8 merges can't push a word
      // below one token, and fertility is exactly tokens/words
      assert(nt >= nWords && f == nt.toDouble / nw)
    }
    // consistency with the per-doc train->apply queries (same memo)
    val bpeTotal = graft.SparkEntry.queries("e59_bpe_tokenize")(spark, sf0001)
      .agg(sum(col("n_bpe_tokens"))).head.getLong(0)
    val uniTotal = graft.SparkEntry.queries("e64_unigram_tokenize")(spark, sf0001)
      .agg(sum(col("n_tokens"))).head.getLong(0)
    assert(sb("bpe")._2 == bpeTotal && sb("unigram")._2 == uniTotal)
  }

  test("wordpiece on the fixture corpus is deterministic across partitionings") {
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = Bpe.bpeMerges(corpus, 4, likelihood = true)
      .as[(Int, String, String, String, Long)].collect().toSeq
    val b = Bpe.bpeMerges(corpus.repartition(13), 4, likelihood = true)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(a.nonEmpty && a == b)
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
