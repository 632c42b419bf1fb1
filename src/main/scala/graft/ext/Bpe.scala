package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING over a corpus (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units" —
  * the subword-vocabulary learning step every LLM data pipeline runs
  * before token counting even makes sense).
  *
  * BPE trains on the WORD-FREQUENCY table, not the corpus: pre-tokenize
  * to (word, count), split words into character symbols, then per round
  * (1) count adjacent symbol pairs weighted by word count, (2) pick the
  * most frequent pair (ties to the lexicographically smaller pair — a
  * total order, where reference implementations inherit dict order),
  * (3) merge every non-overlapping occurrence greedily left-to-right.
  * The learned artifact is the ordered merge table.
  *
  * Everything is relational and engine-portable: pair counting is a
  * self-join on position, and the greedy merge is the classic
  * gaps-and-islands trick — overlapping candidates form runs of
  * consecutive positions, and greedy left-to-right selection is exactly
  * the odd ranks within each run. No fold, no UDF, no arrival-order
  * dependence — the DuckDB oracle replays every round verbatim.
  *
  * Scale shape (100 TB): the corpus collapses to its word-frequency
  * table in one map-side-combined aggregation — vocabulary-sized
  * (millions of rows), NOT corpus-sized — and every training round is
  * a handful of joins/windows over that small frame, all partitioned
  * by word. The per-round argmax is a 1-row aggregate. This is why BPE
  * training is cheap even on web-scale corpora, and the plan shows it.
  */
object Bpe {

  /** The learned merge table after `rounds` merges: (round, lhs, rhs,
    * merged, pair_count), round 1-based in learning order. Words
    * shorter than 2 symbols stop contributing pairs naturally; training
    * stops early (fewer output rows) if no pair occurs at least twice.
    * `likelihood = true` trains WORDPIECE instead of BPE — same merge
    * machinery, different argmax (see [[train]]).
    */
  def bpeMerges(docs: DataFrame, rounds: Int, textCol: String = "text",
      likelihood: Boolean = false): DataFrame =
    train(docs, rounds, textCol, likelihood)._1

  /** Per-document BPE token counts under the vocabulary learned by
    * `rounds` merges — the production tokenization shape: merges apply
    * to the VOCABULARY table (each distinct word segments once), and
    * the corpus is tokenized by a dictionary join of its word stream
    * against the segmented vocab — no per-document merge loop ever
    * touches corpus-scale data. Output: (idCol, n_bpe_tokens). */
  def bpeTokenCounts(docs: DataFrame, rounds: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    tokenCountsFrom(docs, train(docs, rounds, textCol)._2, idCol, textCol)

  /** Per-document token counts from an ALREADY-TRAINED segmentation
    * (the second element of [[train]]): merges apply to the vocabulary
    * once, the corpus tokenizes by dictionary join. Lets a session
    * train once and tokenize many times (the e58/e59 memo path). */
  def tokenCountsFrom(docs: DataFrame, segmentation: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val perWord = segmentation.groupBy("wid").agg(count(lit(1)).as("t"))
    docs.select(col(idCol).as(idCol), explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0)
      .join(perWord, col("w") === col("wid"))
      .groupBy(idCol).agg(sum(col("t")).as("n_bpe_tokens"))
  }

  /** Training loop shared by [[bpeMerges]] (returns the merge table)
    * and [[bpeTokenCounts]] (returns the final per-word segmentation
    * `(wid, n, pos, sym)`). Public so a session can compute BOTH
    * artifacts once and share them across queries.
    *
    * `likelihood = true` switches the per-round argmax from raw pair
    * frequency (BPE, Sennrich 2016) to the WORDPIECE criterion (Schuster
    * & Nakajima 2012; the BERT tokenizer): merge the pair maximizing
    * `count(lhs,rhs) / (count(lhs)·count(rhs))` — the training-corpus
    * likelihood gain of the merge. The ratio is quantized to the
    * engine's eighth-bit integer log2 ([[Retrieval.log8Sql]]):
    * `s8 = log8(pair) - log8(c(lhs)) - log8(c(rhs))`, which is exact,
    * overflow-free at any corpus size (log-space — no `c(lhs)·c(rhs)`
    * product ever evaluates), and replayed verbatim by the DuckDB
    * oracle; ties break (pair_count desc, lhs, rhs) — a total order.
    * Everything else — pair counting, the ≥2 frequency floor, the
    * greedy gaps-and-islands merge, the one-action-per-round loop —
    * is shared with BPE, which is the honest relationship between the
    * two algorithms. The extra per-round cost is one symbol-count
    * aggregate (vocabulary-sized) joined onto the pair argmax. */
  def train(docs: DataFrame, rounds: Int,
      textCol: String = "text",
      likelihood: Boolean = false): (DataFrame, DataFrame) = {
    require(rounds >= 1, s"bpe training needs rounds >= 1, got $rounds")
    val spark = docs.sparkSession
    // (wid = the word itself, n, pos 1-based, sym) — character symbols
    val chars = transform(sequence(lit(1), length(col("w"))),
      i => col("w").substr(i, lit(1)))
    var syms = docs.select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(col("w").as("wid"), col("n"),
        posexplode(chars).as(Seq("p0", "sym")))
      .select(col("wid"), col("n"), (col("p0") + 1).as("pos"), col("sym"))
      .localCheckpoint()
    val wWid = Window.partitionBy("wid").orderBy("pos")
    // ONE action per round (the round-10 task-7 target; was three jobs:
    // the argmax checkpoint, its emptiness probe, and the merge cut):
    //  - adjacent pairs come from a `lead` window, not a positional
    //    self-join (one shuffle by wid instead of three);
    //  - the 1-row argmax rides INSIDE the merge-cut plan as a
    //    broadcast, and its (lhs, rhs, count) is extracted driver-side
    //    through an `Observation` on that subplan — no separate job;
    //  - the greedy left-to-right merge is the same gaps-and-islands
    //    rule expressed in one window pass: within a run of consecutive
    //    candidate positions, merge exactly the even offsets from the
    //    run start (== the odd ranks of the old formulation).
    // The merge table therefore accumulates as DRIVER literals (1 row
    // per round), and the final e58 plan is a LocalRelation.
    var merges = Seq.empty[(Int, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val pairs = syms
        .withColumn("_nx", lead(col("sym"), 1).over(wWid))
        .where(col("_nx").isNotNull)
        .select(col("wid"), col("pos"), col("n"),
          col("sym").as("lhs"), col("_nx").as("rhs"))
      val obs = new org.apache.spark.sql.Observation(
        s"bpe_best_${r}_${obsTag.incrementAndGet()}")
      val pairAgg = pairs.groupBy("lhs", "rhs")
        .agg(sum(col("n")).as("pair_count"))
        .where(col("pair_count") >= 2)
      val ranked =
        if (!likelihood) pairAgg.orderBy(desc("pair_count"), asc("lhs"), asc("rhs"))
        else {
          val cnts = syms.groupBy("sym").agg(sum(col("n")).as("_c1"))
          def log8(c: String) = expr(Retrieval.log8Sql(c))
          pairAgg
            .join(cnts.select(col("sym").as("lhs"), col("_c1").as("_cl")), "lhs")
            .join(cnts.select(col("sym").as("rhs"), col("_c1").as("_cr")), "rhs")
            .withColumn("_s8",
              log8("pair_count") - log8("_cl") - log8("_cr"))
            .orderBy(desc("_s8"), desc("pair_count"), asc("lhs"), asc("rhs"))
        }
      val best = ranked.limit(1)
        .select(col("lhs").as("_bl"), col("rhs").as("_br"),
          col("pair_count").as("_bc"))
      // empty best -> empty crossJoin -> empty next frame; the observed
      // rows == 0 routes to the exhausted exit below, which discards it.
      // The observation sits on the MAIN stream (the crossJoin replicates
      // the 1-row argmax onto every symbol row), NOT on the broadcast
      // subplan — metrics inside a broadcast exchange never reach the
      // observation listener.
      val merged = syms.crossJoin(broadcast(best))
        .observe(obs, count(lit(1)).as("rows"), max(col("_bl")).as("lhs"),
          max(col("_br")).as("rhs"), max(col("_bc")).as("cnt"))
        .withColumn("_nx", lead(col("sym"), 1).over(wWid))
        .withColumn("_m", col("sym") === col("_bl") && col("_nx") === col("_br"))
        .withColumn("_st",
          col("_m") && !coalesce(lag(col("_m"), 1).over(wWid), lit(false)))
        .withColumn("_sp",
          last(when(col("_st"), col("pos")), ignoreNulls = true).over(wWid))
        .withColumn("_mg",
          col("_m") && (col("pos") - col("_sp")) % 2 === 0)
        .withColumn("_dp", coalesce(lag(col("_mg"), 1).over(wWid), lit(false)))
        .where(!col("_dp"))
        .select(col("wid"), col("n"), col("pos").as("op"),
          when(col("_mg"), concat(col("sym"), col("_nx")))
            .otherwise(col("sym")).as("sym"))
        .withColumn("pos", row_number().over(
          Window.partitionBy("wid").orderBy("op")))
        .select("wid", "n", "pos", "sym")
      val next = graft.plans.Supersteps.cut(merged) // the round's ONE action
      // `get` blocks until the cut's action completes. An EMPTY map is
      // the exhausted round in disguise: an empty argmax makes AQE
      // propagate the empty broadcast through the crossJoin and prune
      // the plan — CollectMetrics included — so no metrics row is ever
      // produced. A non-empty round always reports (rows >= 1).
      val m = obs.get
      if (m.isEmpty || m("rows").asInstanceOf[Long] == 0L) {
        exhausted = true
        graft.plans.Supersteps.release(next) // empty — syms stands
      } else {
        val (bl, br) = (m("lhs").toString, m("rhs").toString)
        merges :+= ((r, bl, br, bl + br, m("cnt").asInstanceOf[Long]))
        // the pre-merge segmentation (incl. the round-1 seed, which is
        // loop-owned) is dead once the new cut landed
        graft.plans.Supersteps.release(syms)
        syms = next
        r += 1
      }
    }
    import spark.implicits._
    val table = merges
      .toDF("round", "lhs", "rhs", "merged", "pair_count").orderBy("round")
    (table, syms)
  }

  private val obsTag = new java.util.concurrent.atomic.AtomicLong()
}
