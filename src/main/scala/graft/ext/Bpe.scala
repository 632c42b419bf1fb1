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
    */
  def bpeMerges(docs: DataFrame, rounds: Int, textCol: String = "text"): DataFrame =
    train(docs, rounds, textCol)._1

  /** Per-document BPE token counts under the vocabulary learned by
    * `rounds` merges — the production tokenization shape: merges apply
    * to the VOCABULARY table (each distinct word segments once), and
    * the corpus is tokenized by a dictionary join of its word stream
    * against the segmented vocab — no per-document merge loop ever
    * touches corpus-scale data. Output: (idCol, n_bpe_tokens). */
  def bpeTokenCounts(docs: DataFrame, rounds: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val perWord = train(docs, rounds, textCol)._2
      .groupBy("wid").agg(count(lit(1)).as("t"))
    docs.select(col(idCol).as(idCol), explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0)
      .join(perWord, col("w") === col("wid"))
      .groupBy(idCol).agg(sum(col("t")).as("n_bpe_tokens"))
  }

  /** Training loop shared by [[bpeMerges]] (returns the merge table)
    * and [[bpeTokenCounts]] (returns the final per-word segmentation
    * `(wid, n, pos, sym)`). */
  private def train(docs: DataFrame, rounds: Int,
      textCol: String): (DataFrame, DataFrame) = {
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
    val wIsl = Window.partitionBy("wid", "g").orderBy("pos")
    var merges = Seq.empty[DataFrame]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val pairs = syms.alias("a")
        .join(syms.alias("b"),
          col("a.wid") === col("b.wid") && col("b.pos") === col("a.pos") + 1)
        .select(col("a.wid").as("wid"), col("a.pos").as("pos"),
          col("a.n").as("n"), col("a.sym").as("lhs"), col("b.sym").as("rhs"))
      val best = pairs.groupBy("lhs", "rhs").agg(sum(col("n")).as("pair_count"))
        .where(col("pair_count") >= 2)
        .orderBy(desc("pair_count"), asc("lhs"), asc("rhs")).limit(1)
        .select(lit(r).as("round"), col("lhs"), col("rhs"),
          concat(col("lhs"), col("rhs")).as("merged"), col("pair_count"))
        .localCheckpoint()
      if (best.isEmpty) exhausted = true
      else {
        merges :+= best
        // greedy left-to-right: candidate runs -> odd ranks merge
        val cand = pairs.join(broadcast(best), Seq("lhs", "rhs"))
          .select(col("wid"), col("pos"))
        val sel = cand
          .withColumn("g", col("pos") - row_number().over(wWid))
          .withColumn("rk", row_number().over(wIsl))
          .where(col("rk") % 2 === 1)
          .select(col("wid"), col("pos"))
        syms = graft.plans.Supersteps.cut(syms.alias("a")
          .join(sel.alias("s"),
            col("a.wid") === col("s.wid") && col("a.pos") === col("s.pos"), "left")
          .join(sel.alias("s2"),
            col("a.wid") === col("s2.wid") && col("a.pos") === col("s2.pos") + 1, "left")
          .join(syms.alias("nxt"),
            col("a.wid") === col("nxt.wid") && col("nxt.pos") === col("a.pos") + 1, "left")
          .where(col("s2.pos").isNull) // rows merged into their predecessor drop
          .select(col("a.wid").as("wid"), col("a.n").as("n"),
            col("a.pos").as("op"),
            when(col("s.pos").isNotNull, concat(col("a.sym"), col("nxt.sym")))
              .otherwise(col("a.sym")).as("sym"))
          .withColumn("pos", row_number().over(
            Window.partitionBy("wid").orderBy("op")))
          .select("wid", "n", "pos", "sym"))
        r += 1
      }
    }
    val table =
      if (merges.isEmpty) {
        import spark.implicits._
        Seq.empty[(Int, String, String, String, Long)]
          .toDF("round", "lhs", "rhs", "merged", "pair_count")
      } else merges.reduce(_.unionByName(_)).orderBy("round")
    (table, syms)
  }
}
