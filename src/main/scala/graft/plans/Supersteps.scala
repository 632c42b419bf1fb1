package graft.plans

import org.apache.spark.sql.DataFrame

/** Superstep checkpoint discipline.
  *
  * Every iterative loop in this engine (min-label components, BFS
  * frontiers, k-core peels, LPA, PageRank, the e29 dedup-cluster loop)
  * carries its state through `Dataset.localCheckpoint` so lineage stays
  * linear. Spark 4's `localCheckpoint`, however, cuts only the LINEAGE:
  * `LogicalRDD.fromDataset` rewrites the parent plan's ESTIMATED
  * statistics onto the checkpointed leaf
  * (`rewriteStatsAndConstraints`, sql/core ExistingRDD.scala), and
  * Catalyst's size-only join estimate is the PRODUCT of the children's
  * `sizeInBytes`. A superstep whose round references the loop state r
  * times therefore compounds the estimate geometrically — after n
  * rounds the `BigInt` carries on the order of r^n digits. The decimal
  * expansion itself becomes the cost: computing the next round's stats
  * is a driver-side `BigInteger` multiply over those digits, which
  * crosses from nanoseconds to MINUTES within ~10 rounds at r >= 3
  * (observed: the q49 incremental-components fold, 3 batches x ~4
  * pointer-jump rounds at r = 4, wedged the bench driver for >15 min
  * inside `SizeInBytesOnlyStatsPlanVisitor` Toom-Cook multiplies). An
  * unbounded streaming fold (`Streams.ComponentsMaintainer`) makes the
  * cut mandatory rather than cosmetic: digits would otherwise grow
  * with stream length.
  *
  * [[cut]] checkpoints and then re-wraps the persisted RDD through the
  * public `createDataFrame(RDD[Row], schema)` entry, which builds a
  * fresh `LogicalRDD` with NO carried statistics — the leaf reports the
  * session default again, exactly like a round-1 frame. The price is
  * one Row <-> InternalRow conversion per downstream evaluation, a
  * narrow map over the persisted blocks — noise next to the per-round
  * shuffle, and independent of round count. Broadcast decisions lose
  * the (by then astronomically wrong) estimate and fall to AQE, which
  * re-plans from ACTUAL shuffle sizes at runtime — the correct signal
  * for loop state whose size the planner cannot know anyway.
  *
  * One-shot frames (edge sets, seed frontiers) keep plain
  * `localCheckpoint`: their stats are computed once from real leaves,
  * stay small, and remain useful to the planner.
  */
object Supersteps {

  /** `localCheckpoint` that cuts lineage AND statistics — use for any
    * frame that feeds back into the next round of a loop. Eager: the
    * checkpoint materializes (and fires any attached `Observation`)
    * before this returns. */
  def cut(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    // Zero-copy form: swap the checkpointed leaf for a stats-free twin
    // (same InternalRow RDD, same partitioning). The createDataFrame
    // fallback pays a Row <-> InternalRow conversion per downstream
    // evaluation and forgets partitioning — measured ~2x across the SNB
    // superstep queries at sf0.1 — so it only covers non-leaf plans,
    // which localCheckpoint never produces in practice.
    org.apache.spark.sql.GraftSqlShims.statsFreeLogicalRddCopy(ck)
      .getOrElse(ck.sparkSession.createDataFrame(ck.rdd, ck.schema))
  }
}
