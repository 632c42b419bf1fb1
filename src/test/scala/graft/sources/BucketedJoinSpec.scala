package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{EdgeSpec, GraphColumns => GC}

/** Bucketed persist: co-bucketed frames must join without a shuffle on
  * the bucket key — the 100 TB repeated-hop-join answer. */
class BucketedJoinSpec extends SparkSpec {

  test("co-bucketed edge frames join with no shuffle exchange") {
    val g = GraphLoader.tpch(spark, sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    GraphLoader.persistBucketed(g, tmp, prefix = "bspec", buckets = 8)
    val b = GraphLoader.openBucketed(spark, g, "bspec")

    // disable auto-broadcast BEFORE planning so the small fixture can't
    // take the broadcast path and mask the bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val contains = b.edgeFrames(EdgeSpec("CONTAINS", "Order", "Part"))
      val supplied = b.edgeFrames(EdgeSpec("SUPPLIED_BY", "Order", "Supplier"))
      val joined = contains.select(col(GC.Src), col(GC.Dst))
        .join(supplied.select(col(GC.Src).as("_src2"), col(GC.Dst).as("_sup")),
          col(GC.Src) === col("_src2"))

      // correctness: same result as the unbucketed join
      val plainA = g.edgeFrames(EdgeSpec("CONTAINS", "Order", "Part"))
      val plainB = g.edgeFrames(EdgeSpec("SUPPLIED_BY", "Order", "Supplier"))
      val plain = plainA.select(col(GC.Src), col(GC.Dst))
        .join(plainB.select(col(GC.Src).as("_src2"), col(GC.Dst).as("_sup")),
          col(GC.Src) === col("_src2"))
      assert(joined.count() == plain.count())

      // plan: a sort-merge/shuffled-hash join with NO shuffle exchange —
      // both sides read pre-bucketed
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan.take(500))
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
