package graft.ext

import graft.SparkSpec

class TextSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat, and the dog slept."),
    (2L, "der hund und die katze das ist gut"),
    (3L, "xyzzy plugh")).toDF("doc_id", "text")

  test("tokenStats counts tokens, stopwords, punctuation") {
    val m = Text.tokenStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(m(1L) == ((10, 5, 2)))   // 10 tokens; the,on,the,and,the; one comma + one period
    assert(m(3L) == ((2, 0, 0)))
  }

  test("qualityScore is in [0,1] and prose scores above noise") {
    val q = Text.qualityScore(docs).as[(Long, Double)].collect().toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(3L))
  }

  test("langId picks marker-dominant language, und for no hits") {
    val l = Text.langId(docs).as[(Long, String)].collect().toMap
    assert(l(1L) == "en")
    assert(l(2L) == "de")
    assert(l(3L) == "und")
  }

  test("fingerprints: md5 of text and prefix") {
    val f = Text.fingerprints(docs).collect()
    assert(f.forall(_.getString(1).length == 32))
    // doc 3 text < 64 chars: prefix fp == full fp
    val r3 = f.find(_.getLong(0) == 3L).get
    assert(r3.getString(1) == r3.getString(2))
  }

  test("winnowing guarantees a shared fingerprint for long shared runs") {
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val wdocs = Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"$shared delta epsilon zeta"),
      (3L, "completely different words with no overlap at all here")
    ).toDF("doc_id", "text")
    def run() = Text.winnowingFingerprintSet(wdocs, window = 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val fps = run()
    // 12 shared tokens = 10 shared shingles, longer than window+2: the
    // winnowing guarantee forces a common fingerprint for docs 1 and 2
    assert((fps(1L) & fps(2L)).nonEmpty)
    assert((fps(1L) & fps(3L)).isEmpty)
    assert(run() == fps) // deterministic
  }
}
