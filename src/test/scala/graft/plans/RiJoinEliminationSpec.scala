package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RiJoinEliminationSpec extends SparkSpec {
  import spark.implicits._

  private def frontier = spark.read.parquet(s"$sf0001/customer.parquet")
    .select(col("c_custkey").cast("bigint").as("_fid"))
  private def edges = spark.read.parquet(s"$sf0001/orders.parquet")
    .select(col("o_orderkey").cast("bigint").as("_src"),
      col("o_custkey").cast("bigint").as("_dst"))

  test("declared RI frontier join is eliminated from the optimized plan") {
    RiJoinElimination.install(spark)
    RiJoinElimination.declareVertexFrame(s"$sf0001/customer.parquet", "c_custkey")
    try {
      val joined = edges.join(frontier, col("_dst") === col("_fid"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("Join"), s"join not eliminated:\n$optimized")
      // results are identical to the un-eliminated join (RI holds here)
      RiJoinElimination.clearDeclarations()
      val want = edges.join(frontier, col("_dst") === col("_fid"))
        .as[(Long, Long, Long)].collect().sorted.toSeq
      RiJoinElimination.declareVertexFrame(s"$sf0001/customer.parquet", "c_custkey")
      val got = joined.as[(Long, Long, Long)].collect().sorted.toSeq
      assert(got == want && got.nonEmpty)
      // the eliminated side's column is still addressable downstream
      assert(joined.select("_fid").count() == got.size)
    } finally RiJoinElimination.clearDeclarations()
  }

  test("undeclared frames keep their join") {
    RiJoinElimination.install(spark)
    RiJoinElimination.clearDeclarations()
    val joined = edges.join(frontier, col("_dst") === col("_fid"))
    assert(joined.queryExecution.optimizedPlan.toString.contains("Join"))
  }
}
