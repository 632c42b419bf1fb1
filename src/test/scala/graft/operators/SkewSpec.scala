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
}
