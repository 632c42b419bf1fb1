package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("viterbiSegments reconstructs every word exactly, in order") {
    val words = Unigram.wordFreqs(docs)
    val segs = Unigram.viterbiSegments(words, Unigram.costs(Unigram.seedVocab(words)))
      .select("w", "start", "piece").as[(String, Int, String)].collect()
    assert(segs.nonEmpty)
    val byW = segs.groupBy(_._1)
    assert(byW.keySet == words.select("w").as[String].collect().toSet)
    byW.foreach { case (w, rows) =>
      val ordered = rows.sortBy(_._2)
      // pieces tile the word: starts line up, concat equals the word
      assert(ordered.map(_._3).mkString == w, s"bad tiling for $w")
      var pos = 1
      ordered.foreach { case (_, start, piece) =>
        assert(start == pos); pos += piece.length
      }
      assert(rows.forall(_._3.length <= Unigram.MaxPieceLen))
    }
  }

  test("training concentrates mass on repeated pieces and keeps char fallback") {
    val corpus = Seq((1L, "abab abab abab cd"), (2L, "abab abab zq"))
      .toDF("doc_id", "text")
    val vocab = Unigram.train(corpus, rounds = 2)
      .as[(String, Long)].collect().toMap
    // the dominant word "abab" must resolve to a <=4-char piece carrying
    // its full mass (the whole word is itself a candidate piece)
    assert(vocab.getOrElse("abab", 0L) >= 5L, s"vocab: $vocab")
    // single chars always survive with count >= 1
    Seq("a", "b", "c", "d", "z", "q").foreach(c => assert(vocab.contains(c)))
  }

  test("training is deterministic and partitioning-independent") {
    val a = Unigram.train(docs, rounds = 2).as[(String, Long)].collect().toMap
    val b = Unigram.train(docs.repartition(13), rounds = 2)
      .as[(String, Long)].collect().toMap
    assert(a == b && a.nonEmpty)
  }

  test("oversized words are rejected loudly") {
    val bad = Seq((1L, "a" * (Unigram.MaxWordLen + 1))).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException](Unigram.train(bad))
  }
}
