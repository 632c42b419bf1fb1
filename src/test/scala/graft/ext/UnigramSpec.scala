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

  test("apply pass: corpus token mass equals freq-weighted per-word pieces") {
    val vocab = Unigram.train(docs, rounds = 2)
    val words = Unigram.wordFreqs(docs)
    val perWord = Unigram.viterbiSegments(words, Unigram.costs(vocab))
      .groupBy("w").agg(count(lit(1)).as("n_pieces"))
    val viaWords = perWord.select(col("w").as("_pw"), col("n_pieces"))
      .join(words, col("_pw") === col("w"))
      .agg(sum(col("n_pieces") * col("freq"))).as[Long].head()
    val viaDocs = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .join(perWord, "w")
      .agg(sum(col("n_pieces"))).as[Long].head()
    assert(viaWords == viaDocs && viaWords > 0)
    // segmentation never exceeds chars and never beats one piece per
    // <=MaxPieceLen chars
    val bad = perWord.select(col("w").as("_pw"), col("n_pieces"))
      .join(words, col("_pw") === col("w"))
      .where(col("n_pieces") > length(col("w")) ||
        col("n_pieces") * Unigram.MaxPieceLen < length(col("w")))
      .count()
    assert(bad == 0L)
  }

  test("oversized words are rejected loudly") {
    val bad = Seq((1L, "a" * (Unigram.MaxWordLen + 1))).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException](Unigram.train(bad))
  }
}
