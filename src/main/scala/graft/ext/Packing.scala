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

  /** Assign each row to the pack its exclusive token prefix-sum starts
    * in: `pack_id = floor(prefix / budget)`. Invariant: the docs
    * ASSIGNED to a pack started within one budget's span, so a pack
    * holds at most `budget` tokens plus the overhang of docs straddling
    * its end — for docs all smaller than the budget that overhang is
    * under one doc. Docs LARGER than the budget overflow whatever pack
    * their prefix lands in (possibly sharing it with earlier docs);
    * callers feeding fixed-length sequence builders should pre-split
    * oversize docs to the budget first, as real tokenizer pipelines do.
    * Output: input columns + (shard, pack_id), packs local to a shard.
    */
  /** Split rows whose token count exceeds the budget into budget-sized
    * pieces (the last piece carries the remainder) — the pre-pass that
    * makes [[contiguousPack]]'s budget bound tight, mirroring how
    * tokenizer pipelines chunk documents longer than the sequence
    * length. Row-local explode, no shuffle. Output: the input columns
    * plus `piece_idx` and `piece_tokens` (use `piece_tokens` as the
    * pack input; rows with `tokensCol <= budget` pass through as one
    * piece). All pieces of a doc share the doc's id, so when feeding
    * [[contiguousPack]] pass `tieBreak = Seq(col("piece_idx"))` — the
    * id alone no longer orders the shard and the pack assignment of a
    * tied group would depend on partition order. */
  def splitOversize(df: DataFrame, tokensCol: Column, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    df.withColumn("_t", tokensCol.cast("long"))
      .withColumn("piece_idx",
        explode(sequence(lit(0L),
          greatest(lit(0L), expr(s"(_t - 1) div $budgetTokens")))))
      .withColumn("piece_tokens",
        least(lit(budgetTokens), col("_t") - col("piece_idx") * lit(budgetTokens)))
      .drop("_t")
  }

  /** Deterministic EPOCH SHUFFLE + shard export — the step that hands a
    * finished corpus to the training dataloader: every row gets a
    * `(shard, pos)` address where `shard = md5(epoch ":" key) mod n`
    * and `pos` is the row's rank inside its shard under the same hash
    * (hash order = uniform random order, but a pure function of
    * `(epoch, key)` — the [[Sampling.hashSample]] membership
    * discipline applied to PERMUTATION). Re-running an epoch reproduces
    * the identical global order; bumping `epoch` draws a fresh
    * independent permutation, which is exactly what per-epoch
    * shuffling needs. Ties (hash collisions) break by key, so the
    * order is total and partitioning-independent — PROVIDED the key is
    * unique per row (the [[contiguousPack]] determinism contract): rows
    * sharing a key tie on both sort columns and their relative `pos`
    * would fall to partition arrival order. Shuffle at the document
    * grain, or extend the key with a disambiguator, before sharding
    * duplicate-keyed rows.
    *
    * Scale shape: one shuffle on `shard` (the window partition), one
    * in-shard sort; `shards` bounds the per-task sort — size it so a
    * shard fits an executor (the [[contiguousPack]] rule). Writers
    * compose with `.write.partitionBy("shard")` for one output file
    * per dataloader worker. Output: input columns + (shard, pos),
    * pos 1-based within shard. */
  def shardShuffle(df: DataFrame, key: Column, shards: Int,
      epoch: Long = 0L): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val h = conv(substring(md5(concat_ws(":", lit(epoch), key.cast("string"))),
      1, 15), 16, 10).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col("_h"), key)
    df.withColumn("_h", h)
      .withColumn("shard", pmod(col("_h"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(w))
      .drop("_h")
  }

  def contiguousPack(df: DataFrame, idCol: Column, tokensCol: Column,
      budgetTokens: Long, shards: Int = 64,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    require(shards > 0, s"shards must be positive, got $shards")
    // Determinism contract: (idCol +: tieBreak) must totally order each
    // shard. With duplicate ids (e.g. splitOversize pieces) and no
    // tieBreak, the running sum's tie order — hence pack_id — would be
    // partition-dependent; callers composing with splitOversize pass
    // its piece_idx here.
    val w = Window.partitionBy(col("shard")).orderBy(idCol +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", pmod(idCol, lit(shards.toLong)))
      // exclusive prefix sum: the pack a doc STARTS in. Integral `div`,
      // not Column `/`: double division loses exactness once a shard's
      // running token total passes 2^52 (the RangeJoin bucketing lesson).
      .withColumn("_excl", sum(tokensCol).over(w) - tokensCol)
      .withColumn("pack_id", expr(s"_excl div $budgetTokens"))
      .drop("_excl")
  }

  /** Delta-stable repack — what keeps TRAINING SHARDS valid across
    * crawls: [[contiguousPack]]'s shard membership is a pure function
    * of the id (`pmod(id, shards)`) and its pack window never crosses
    * a shard, so a corpus delta can only move pack boundaries INSIDE
    * the shards that contain delta ids. Given the frozen base packing
    * and the delta id set (e.g. the union of
    * [[graft.ext.Snapshot.deltaWorkLists]]'s two lists), recompute
    * exactly those DIRTY shards from the newer corpus and pass every
    * other shard's rows through from the base BYTE-IDENTICALLY — those
    * shard files never rewrite (PackingSpec law; whole-result equality
    * with a full repack is the e118 oracle). Cost: one distinct over
    * the delta ids, a broadcast anti/semi join pair on the shard key,
    * and the in-shard window over dirty-shard rows only — a full
    * repack's corpus-sized window work collapses to
    * ~|dirty shards| / shards of the corpus. */
  def repackDirtyShards(basePacked: DataFrame, newer: DataFrame,
      deltaIds: DataFrame, idCol: Column, tokensCol: Column,
      budgetTokens: Long, shards: Int = 64,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    require(shards > 0, s"shards must be positive, got $shards")
    val dirty = deltaIds
      .select(pmod(idCol, lit(shards.toLong)).as("shard")).distinct()
    // re-select: the key-equi join hoists `shard` to the front; the
    // pass-through must keep the base frame's column order
    val kept = basePacked.join(broadcast(dirty), Seq("shard"), "left_anti")
      .select(basePacked.columns.map(col).toSeq: _*)
    val toRepack = newer
      .withColumn("shard", pmod(idCol, lit(shards.toLong)))
      .join(broadcast(dirty), Seq("shard"), "left_semi")
      .drop("shard")
    kept.unionByName(contiguousPack(toRepack, idCol, tokensCol,
      budgetTokens, shards, tieBreak))
  }

  /** Fill statistics of a packed frame (`(shard, pack_id)` assigned by
    * [[contiguousPack]]): ONE row
    * `(n_packs, total_tokens, mean_fill_milli, min_fill_milli,
    * max_fill_milli)`, fill as exact integer milli of the budget
    * (mean = total·1000 div (n_packs·budget)). The measured-waste
    * number a packing decision should rest on — a mean fill of 850
    * milli means 15% of every training batch is padding. One pack
    * aggregate + one 1-row fold; integer throughout. */
  def packStats(packed: DataFrame, tokensCol: Column, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budget must be positive, got $budgetTokens")
    packed.groupBy(col("shard"), col("pack_id"))
      .agg(sum(tokensCol).as("_pt"))
      .agg(count(lit(1)).as("n_packs"), sum(col("_pt")).as("total_tokens"),
        min(expr(s"_pt * 1000 div $budgetTokens")).as("min_fill_milli"),
        max(expr(s"_pt * 1000 div $budgetTokens")).as("max_fill_milli"))
      .withColumn("mean_fill_milli",
        expr(s"total_tokens * 1000 div (n_packs * $budgetTokens)"))
      .select(col("n_packs"), col("total_tokens"), col("mean_fill_milli"),
        col("min_fill_milli"), col("max_fill_milli"))
  }

  /** The boundary-free ideal in the same statistic: concatenate each
    * shard's token stream and cut every `budget` tokens — every pack
    * full except at most one tail per shard. Needs only the per-shard
    * token totals (one group aggregate), so it prices the UPPER BOUND
    * any doc-boundary-respecting packer is judged against. */
  def idealCutStats(df: DataFrame, idCol: Column, tokensCol: Column,
      budgetTokens: Long, shards: Int): DataFrame = {
    require(budgetTokens > 0 && shards > 0,
      s"budget/shards must be positive, got $budgetTokens/$shards")
    df.withColumn("shard", pmod(idCol, lit(shards.toLong)))
      .groupBy("shard").agg(sum(tokensCol).as("_t"))
      .withColumn("_full", expr(s"_t div $budgetTokens"))
      .withColumn("_tail", expr(s"_t % $budgetTokens"))
      .agg(
        sum(expr("_full + CASE WHEN _tail > 0 THEN 1L ELSE 0L END")).as("n_packs"),
        sum(col("_t")).as("total_tokens"),
        min(expr(s"CASE WHEN _tail > 0 THEN _tail * 1000 div $budgetTokens ELSE 1000L END"))
          .as("min_fill_milli"),
        max(expr(s"CASE WHEN _full > 0 THEN 1000L ELSE _tail * 1000 div $budgetTokens END"))
          .as("max_fill_milli"))
      .withColumn("mean_fill_milli",
        expr(s"total_tokens * 1000 div (n_packs * $budgetTokens)"))
      .select(col("n_packs"), col("total_tokens"), col("mean_fill_milli"),
        col("min_fill_milli"), col("max_fill_milli"))
  }
}
