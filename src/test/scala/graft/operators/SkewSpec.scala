package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin equals the plain join, including hot keys") {
    // key 1 is hot: 1000 rows; keys 2..10 one row each
    val big = (Seq.fill(1000)(1L) ++ (2L to 10L)).zipWithIndex
      .toDF("k", "payload")
    val small = Seq((1L, "a"), (2L, "b"), (99L, "zz")).toDF("sk", "tag")

    val plain = big.join(small, $"k" === $"sk").select("k", "payload", "tag")
    val salted = Skew.saltedEquiJoin(big, small, "k", "sk", salts = 8)
      .select("k", "payload", "tag")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("capFrequency drops only keys above the cap") {
    val df = (Seq.fill(100)("hot") ++ Seq("a", "b", "c")).toDF("k")
    val capped = Skew.capFrequency(df, "k", maxCount = 10)
    assert(capped.select("k").as[String].collect().toSet == Set("a", "b", "c"))
    assert(Skew.hotKeys(df, "k", 10).as[String].collect().toSeq == Seq("hot"))
  }

  test("capBuckets drops only composite buckets above the cap") {
    val df = (Seq.fill(50)((0, "aa")) ++ Seq((0, "bb"), (1, "aa"), (1, "cc")))
      .toDF("band", "bh")
    val capped = Skew.capBuckets(df, Seq("band", "bh"), maxCount = 10)
    assert(capped.as[(Int, String)].collect().toSet ==
      Set((0, "bb"), (1, "aa"), (1, "cc")))
    // cap = MaxValue is the identity
    assert(Skew.capBuckets(df, Seq("band", "bh"), Long.MaxValue).count() == 53)
  }

  test("hot shingle no longer inflates minhash candidate pairs under the cap") {
    // 30 boilerplate docs sharing one text -> identical signatures -> all
    // four band buckets hold 30 members; plus one small near-dup cluster.
    val boiler = (1L to 30L).map(i =>
      (i, "lorem ipsum dolor sit amet consectetur adipiscing elit"))
    val cluster = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"),
      (102L, "the quick brown fox jumps over the lazy dog"))
    val docs = (boiler ++ cluster).toDF("doc_id", "text")

    val uncapped = graft.ext.Dedup.minhashCandidatePairs(docs, Long.MaxValue)
      .as[(Long, Long)].collect().toSet
    assert(uncapped.size == 30 * 29 / 2 + 1) // quadratic blow-up + real pair

    val capped = graft.ext.Dedup.minhashCandidatePairs(docs, maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    assert(capped == Set((101L, 102L))) // hot-bucket pairs gone, signal kept
  }

  test("hot bucket no longer inflates simhash near pairs under the cap") {
    val boiler = (1L to 30L).map(i => (i, "same boilerplate text everywhere again"))
    val cluster = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"),
      (102L, "the quick brown fox jumps over the lazy dog"))
    val docs = (boiler ++ cluster).toDF("doc_id", "text")
    val capped = graft.ext.Dedup.simhashNearPairs(docs, maxDist = 3, maxBucket = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((101L, 102L)))
  }
}
