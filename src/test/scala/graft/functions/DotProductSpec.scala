package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("matches the interpreted fold bitwise on fixture embeddings") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(100)
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("b")))
      .limit(500)
    val native = pairs.select(dotProduct(col("a"), col("b"))).as[Double].collect()
    val interpreted = pairs.select(
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)).as[Double].collect()
    assert(native.toSeq == interpreted.toSeq) // bitwise, not approx
  }

  test("null array yields null; mismatched lengths yield null") {
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(3f, 4f))),
      (None, Some(Array(1f))),
      (Some(Array(1f, 2f)), Some(Array(1f)))).toDF("a", "b")
    val out = df.select(dotProduct(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
  }

  test("double arrays are accepted") {
    val df = Seq((Array(1.5, 2.0), Array(2.0, 3.0))).toDF("a", "b")
    assert(df.select(dotProduct(col("a"), col("b"))).as[Double].head() == 9.0)
  }

  test("non-array input is rejected at analysis") {
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(dotProduct(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }
}
