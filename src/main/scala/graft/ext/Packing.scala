package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batch construction: assign
  * documents to fixed token-budget packs (the step that turns a
  * filtered corpus into training sequences; see e.g. the T5 and
  * GPT-NeoX data pipelines).
  *
  * The distributed form is CONTIGUOUS packing: documents are sharded,
  * ordered deterministically within each shard, and a running token
  * total assigns each doc to pack `floor(prefix_sum / budget)`. This is
  * the standard scalable approximation of first-fit bin packing — true
  * first-fit is inherently sequential, while contiguous packing is one
  * window over each shard and wastes at most one document's tokens per
  * boundary. Deterministic: (shard, doc order) is a pure function of
  * the id, never of partitioning.
  *
  * Scale shape: `shards` bounds the per-window partition (a global
  * order would serialize the corpus through one task); each shard's
  * window is a single pass. At 100 TB raise `shards` so a shard's docs
  * fit an executor's window spill budget.
  */
object Packing {

  /** Assign each row to a pack of at most `budgetTokens` (docs larger
    * than the budget get a pack of their own — they overflow `pack_id`
    * arithmetic gracefully since the prefix sum just jumps). Output:
    * input columns + (shard, pack_id) where packs are local to a shard.
    */
  def contiguousPack(df: DataFrame, idCol: Column, tokensCol: Column,
      budgetTokens: Long, shards: Int = 64): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    require(shards > 0, s"shards must be positive, got $shards")
    val w = Window.partitionBy(col("shard")).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", pmod(idCol, lit(shards.toLong)))
      .withColumn("_cum", sum(tokensCol).over(w))
      // exclusive prefix sum: the pack a doc STARTS in
      .withColumn("pack_id",
        floor((col("_cum") - tokensCol) / lit(budgetTokens)).cast("long"))
      .drop("_cum")
  }
}
