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

  private def declare(): Unit =
    RiJoinElimination.declareForeignKey(spark,
      s"$sf0001/orders.parquet", "o_custkey",
      s"$sf0001/customer.parquet", "c_custkey")

  test("declared FK frontier join is eliminated from the optimized plan") {
    RiJoinElimination.install(spark)
    declare()
    try {
      val joined = edges.join(frontier, col("_dst") === col("_fid"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("Join"), s"join not eliminated:\n$optimized")
      // results are identical to the un-eliminated join (RI holds here)
      RiJoinElimination.clearDeclarations(spark)
      val want = edges.join(frontier, col("_dst") === col("_fid"))
        .as[(Long, Long, Long)].collect().sorted.toSeq
      declare()
      val got = joined.as[(Long, Long, Long)].collect().sorted.toSeq
      assert(got == want && got.nonEmpty)
      // the eliminated side's column is still addressable downstream
      assert(joined.select("_fid").count() == got.size)
    } finally RiJoinElimination.clearDeclarations(spark)
  }

  test("undeclared frames keep their join") {
    RiJoinElimination.install(spark)
    RiJoinElimination.clearDeclarations(spark)
    val joined = edges.join(frontier, col("_dst") === col("_fid"))
    assert(joined.queryExecution.optimizedPlan.toString.contains("Join"))
  }

  test("a non-FK key joined against the declared vertex domain keeps its join") {
    RiJoinElimination.install(spark)
    declare()
    try {
      // nation keys are NOT declared as referencing customer ids: this
      // join filters dangling keys for real and must survive.
      val other = spark.read.parquet(s"$sf0001/nation.parquet")
        .select(col("n_nationkey").cast("bigint").as("_dst"))
      val joined = other.join(frontier, col("_dst") === col("_fid"))
      assert(joined.queryExecution.optimizedPlan.toString.contains("Join"))
      // same edge frame but the WRONG column (o_orderkey is not the FK)
      val wrongCol = spark.read.parquet(s"$sf0001/orders.parquet")
        .select(col("o_orderkey").cast("bigint").as("_dst"))
      val joined2 = wrongCol.join(frontier, col("_dst") === col("_fid"))
      assert(joined2.queryExecution.optimizedPlan.toString.contains("Join"))
      // a computed key breaks provenance even on the declared column
      val computed = spark.read.parquet(s"$sf0001/orders.parquet")
        .select((col("o_custkey").cast("bigint") + 1).as("_dst"))
      val joined3 = computed.join(frontier, col("_dst") === col("_fid"))
      assert(joined3.queryExecution.optimizedPlan.toString.contains("Join"))
    } finally RiJoinElimination.clearDeclarations(spark)
  }

  test("declarations are session-scoped, not JVM-global") {
    RiJoinElimination.install(spark)
    declare()
    val sibling = spark.newSession()
    try {
      RiJoinElimination.install(sibling)
      // the sibling session sees no declarations -> keeps the join
      val sEdges = sibling.read.parquet(s"$sf0001/orders.parquet")
        .select(col("o_custkey").cast("bigint").as("_dst"))
      val sFrontier = sibling.read.parquet(s"$sf0001/customer.parquet")
        .select(col("c_custkey").cast("bigint").as("_fid"))
      val sJoined = sEdges.join(sFrontier, col("_dst") === col("_fid"))
      assert(sJoined.queryExecution.optimizedPlan.toString.contains("Join"))
      // while the declaring session still eliminates
      val joined = edges.join(frontier, col("_dst") === col("_fid"))
      assert(!joined.queryExecution.optimizedPlan.toString.contains("Join"))
    } finally RiJoinElimination.clearDeclarations(spark)
  }

  test("FK provenance survives filters but stops at unions") {
    RiJoinElimination.install(spark)
    declare()
    try {
      // filter + limit + sort chain above the FK column: still provable
      val filtered = edges.where(col("_src") > 0).orderBy("_dst").limit(1000000)
      val j1 = filtered.join(frontier, col("_dst") === col("_fid"))
      assert(!j1.queryExecution.optimizedPlan.toString.contains("Join"))
      // a union can smuggle non-FK values: unprovable, join kept
      val other = spark.read.parquet(s"$sf0001/nation.parquet")
        .select(col("n_nationkey").cast("bigint").as("_src"),
          col("n_regionkey").cast("bigint").as("_dst"))
      val j2 = edges.unionByName(other).join(frontier, col("_dst") === col("_fid"))
      assert(j2.queryExecution.optimizedPlan.toString.contains("Join"))
    } finally RiJoinElimination.clearDeclarations(spark)
  }
}
