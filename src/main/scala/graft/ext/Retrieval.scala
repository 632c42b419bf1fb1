package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over the corpus — the BM25 inverted-index
  * ranking a training pipeline uses for RAG candidate mining, benchmark
  * contamination forensics, and retrieval-based dedup triage.
  *
  * The whole score is ENGINE-PORTABLE FIXED-POINT INTEGER arithmetic
  * (the [[Sampling.dsirScores]] discipline): no float ever evaluates,
  * so the DuckDB oracle replays every stage verbatim and the result is
  * bit-stable under any partitioning. BM25's two transcendental-ish
  * pieces are quantized:
  *
  *  - idf: Robertson idf `ln(1 + (N - df + ½)/(df + ½))` becomes an
  *    eighth-of-a-bit log2 — `x = ((2N-2df+1)·S div (2df+1)) + S` (the
  *    argument scaled by `S = 2^20`), then `idf8 = 8·⌊log2 x⌋ +
  *    (8x >> ⌊log2 x⌋) - 8 - 8·20`: exponent from the minimal binary
  *    rendering's length, mantissa linearly interpolated inside the
  *    octave (the classic integer-log trick). Monotone in the real idf,
  *    ≥ 0, and granular to ~1/8 bit — df ties broken exactly the same
  *    way in both engines.
  *  - tf saturation: with k1 = 6/5 and b = 3/4 as exact rationals, the
  *    per-term factor `tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))` clears
  *    denominators by 10: `(22·tf·S) div (10·tf + 3 + (9·dl·N) div T)`
  *    where T = total corpus tokens (avgdl = T/N). One floor per
  *    division, documented order, identical in both engines.
  *
  * Overflow bound: `(2N+1)·S·8` must fit a signed long ⇒ N < 2^39 docs
  * at the default scale — comfortably past a 100-TB corpus; widen S
  * down or move to DECIMAL(38,0) beyond that.
  *
  * Scale shape (100 TB): postings/df/doc-length are one tokenize pass
  * with map-side-combined counts; the query set is small by definition
  * and BROADCAST onto the postings stream, so the only shuffles carry
  * `(term)`-keyed counts and `(query, doc)` partial scores. Top-k is a
  * per-query window — thousands of concurrent queries partition
  * cleanly; for top-k over a handful of queries at extreme corpus size,
  * swap the window for [[TopKAggregator]] (k rows per partition cross
  * the shuffle instead of every scored candidate).
  */
object Retrieval {

  /** Fixed-point unit for the idf argument and the tf factor. */
  val Scale: Long = 1L << 20

  /** `⌊8·log2 x⌋`-style integer log over the named column, granular to
    * 1/8 bit: exponent via minimal-binary-string length, mantissa via
    * linear interpolation inside the octave (shiftright by the
    * exponent). Exact same rendering in Spark and DuckDB. Shared by
    * the BM25 idf and `Iterative.adamicAdar`'s neighbor discount —
    * any precision change must stay in lockstep with the q57/e60
    * oracle SQL, which inlines the same formula in DuckDB dialect. */
  private[graft] def log8Sql(xCol: String): String =
    s"(8 * (length(bin($xCol)) - 1) " +
      s"+ shiftright($xCol * 8, length(bin($xCol)) - 1) - 8)"

  private def log8(xCol: String): Column = expr(log8Sql(xCol))

  /** BM25 top-k: for each `(query_id, q_text)` row, the `k` best
    * documents by the fixed-point BM25 score above. Query terms are the
    * DISTINCT tokens of `q_text` (query-side tf is ignored — the
    * standard short-query simplification). `excludeSelf` drops the
    * document whose id equals the query id (for corpus-derived query
    * sets). Output: `(query_id, rank, doc_id, score_fp)`. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
      excludeSelf: Boolean = false,
      idCol: String = "doc_id", textCol: String = "text",
      qidCol: String = "query_id", qTextCol: String = "q_text"): DataFrame =
    bm25TopKFromIndex(buildBm25Index(docs, idCol, textCol), queries, k,
      excludeSelf, idCol, qidCol, qTextCol)

  /** The BM25 inverted-index artifact — the frames a search service
    * keeps warm: per-(doc, term) postings with tf, per-doc lengths,
    * term-grain document frequencies. All three are COUNT-MERGEABLE,
    * which is what makes delta maintenance
    * ([[graft.ext.Snapshot.refreshBm25Index]]) possible at all; the
    * corpus totals (N, total tokens) derive from `dl` at scoring time;
    * `dl` is ROW-LOCAL over the source frame (one row per document,
    * NULL text counted as 0 tokens) so N always equals `count(*)` of
    * the corpus — a NULL-content doc must not silently shrink every
    * idf (advisor, round 14). */
  final case class Bm25Index(postings: DataFrame, dl: DataFrame,
      dfreq: DataFrame)

  /** One tokenize pass over the corpus → the [[Bm25Index]] frames
    * (map-side-combined counts, term/doc-keyed shuffles only). `dl` is
    * a row-local `size(split(...))` projection — for non-NULL text it
    * equals the explode-count exactly (split emits `[""]` for the
    * empty string, matching explode's one row), and a NULL-text doc
    * keeps its `(id, 0)` row instead of vanishing, so the corpus
    * totals stay `count(*)`-exact. Cheaper too: the per-doc length
    * needs no explode + groupBy shuffle. */
  def buildBm25Index(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): Bm25Index = {
    val toks = docs.select(col(idCol).as("_id"),
      explode(split(col(textCol), " ")).as("_t"))
    // Explicit NULL branch: size(NULL) is -1 under the default
    // legacy.sizeOfNull flag, so coalesce alone would not cover it.
    val dl = docs.select(col(idCol).as("_id"),
      when(col(textCol).isNull, lit(0L))
        .otherwise(size(split(col(textCol), " ")).cast("long")).as("_dl"))
    val postings = toks.groupBy("_id", "_t").agg(count(lit(1)).as("_tf"))
    Bm25Index(postings, dl, dfreqOf(postings))
  }

  /** Term-grain document frequencies derived from a (possibly already
    * materialized) postings frame — exposed so a caller holding a
    * checkpointed postings artifact can derive `dfreq` without a
    * second tokenize pass over the corpus. */
  def dfreqOf(postings: DataFrame): DataFrame =
    postings.groupBy("_t").agg(count(lit(1)).as("_df"))

  /** [[bm25TopK]] over a PREBUILT (possibly delta-maintained) index —
    * the serving path of a search service whose index lives across
    * crawls: identical scoring arithmetic, the corpus never
    * re-tokenized. */
  def bm25TopKFromIndex(index: Bm25Index, queries: DataFrame, k: Int = 10,
      excludeSelf: Boolean = false, idCol: String = "doc_id",
      qidCol: String = "query_id", qTextCol: String = "q_text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val byQuery = bm25ScoresFromIndex(index, queries, excludeSelf,
      qidCol, qTextCol)
    val w = Window.partitionBy(col("_qid"))
      .orderBy(col("score_fp").desc, col("_id"))
    byQuery.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("_qid").as(qidCol), col("rank"),
        col("_id").as(idCol), col("score_fp"))
  }

  /** The un-ranked BM25 candidate scores `(_qid, _id, score_fp)` —
    * [[bm25TopK]]'s scoring stage, shared with [[hardNegatives]] so
    * exclusion-then-rank variants rank the FILTERED candidate set
    * rather than filtering a pre-cut top list. */
  private def bm25Scores(docs: DataFrame, queries: DataFrame,
      excludeSelf: Boolean, idCol: String, textCol: String,
      qidCol: String, qTextCol: String): DataFrame =
    bm25ScoresFromIndex(buildBm25Index(docs, idCol, textCol), queries,
      excludeSelf, qidCol, qTextCol)

  private def bm25ScoresFromIndex(index: Bm25Index, queries: DataFrame,
      excludeSelf: Boolean, qidCol: String, qTextCol: String): DataFrame = {
    val postings = index.postings
    val dl = index.dl
    val dfreq = index.dfreq
    // N and total-token count derive from the doc-grain frame, which
    // is row-local over the corpus (one row per doc, NULL text = 0
    // tokens), so N == count(*) of the source even with NULL content.
    val nDocs = dl.agg(count(lit(1)).as("_n"))
    val nToks = dl.agg(sum(col("_dl")).as("_tt"))
    val qterms = queries.select(col(qidCol).as("_qid"),
      explode(split(col(qTextCol), " ")).as("_t")).distinct()
    val scored = postings
      .join(broadcast(qterms), "_t")
      .where(if (excludeSelf) col("_qid") =!= col("_id") else lit(true))
      .join(dfreq, "_t")
      .join(dl, "_id")
      .crossJoin(broadcast(nDocs)).crossJoin(broadcast(nToks))
      .withColumn("_x",
        expr(s"((2 * _n - 2 * _df + 1) * ${Scale}L) div (2 * _df + 1)") + lit(Scale))
      .withColumn("_idf8", log8("_x") - lit(8L * 20))
      .withColumn("_contrib", col("_idf8") *
        expr(s"(22 * _tf * ${Scale}L) div (10 * _tf + 3 + (9 * _dl * _n) div _tt)"))
    scored.groupBy(col("_qid"), col("_id"))
      .agg(sum(col("_contrib")).as("score_fp"))
  }

  /** DPR-style hard-negative mining (Karpukhin et al. 2020): for each
    * query, the top-`k` BM25 candidates AFTER excluding the query doc
    * itself and every supplied positive — lexically-close but
    * verified-non-relevant documents, the negatives that actually
    * teach a dense retriever. Exclusion happens BEFORE the per-query
    * rank, so a positive inside the raw top-k frees a slot for the
    * next candidate (filter-then-rank, not rank-then-filter).
    *
    * `positives` is the relevance judgment `(query_id, doc_id)` —
    * here derived from the near-dup relation; production passes its
    * labeled qrels. Scale shape: [[bm25TopK]]'s postings/idf joins
    * plus one anti-join against the (qrels-sized, broadcastable)
    * positives frame; the rank window is per-query.
    * Output: `(query_id, rank, neg_id, score_fp)`. */
  def hardNegatives(docs: DataFrame, queries: DataFrame,
      positives: DataFrame, k: Int = 5,
      idCol: String = "doc_id", textCol: String = "text",
      qidCol: String = "query_id", qTextCol: String = "q_text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val pos = positives.select(col(qidCol).as("_qid"), col(idCol).as("_id"))
    val cand = bm25Scores(docs, queries, excludeSelf = true,
        idCol, textCol, qidCol, qTextCol)
      .join(pos, Seq("_qid", "_id"), "left_anti")
    val w = Window.partitionBy(col("_qid"))
      .orderBy(col("score_fp").desc, col("_id"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("_qid").as(qidCol), col("rank"),
        col("_id").as("neg_id"), col("score_fp"))
  }

  /** Dense retrieval ranks for a DATA-DERIVED query set: exact cosine
    * top-k of `embeddings` (`vec_id`, `embedding`) for every id in
    * `queryIds` (single column `query_id`), self-hits excluded. Same
    * scoring discipline as [[Similarity.bruteForceTopK]] — similarity
    * rounded to 9 decimals before ranking, ties on candidate id — but
    * the query set is a frame, not a literal list, so the op composes
    * with corpus-derived query selections (the [[bm25TopK]] shape) at
    * any scale factor. Output: `(query_id, rank, doc_id)`.
    *
    * Scale: the query frame is small by definition and BROADCAST onto
    * the candidate scan; ranking partitions by query. At extreme corpus
    * size use [[denseRanksAgg]] (identical rows, bounded-heap shuffle);
    * for corpus-scale query sets use the e72 index families instead of
    * brute force. */
  def denseRanks(embeddings: DataFrame, queryIds: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("doc_id"))
    denseScored(embeddings, queryIds)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"))
  }

  /** [[denseRanks]] with the bounded-heap
    * [[graft.ext.TopKAggregator]] instead of a window rank: identical
    * output (the aggregator's buffer stays sorted in exactly the
    * (sim desc, id) order the window uses, so rank = buffer position),
    * but only k candidates per partition per query cross the shuffle —
    * the plan that survives a 100 TB candidate side
    * (`bruteForceTopKAgg`'s discipline applied to the rank-producing
    * form the hybrid fusion consumes). */
  def denseRanksAgg(embeddings: DataFrame, queryIds: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    denseScored(embeddings, queryIds)
      .groupBy("query_id")
      .agg(TopKAggregator.asColumn(k, col("sim"), col("doc_id")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("s.neighbor_id").as("doc_id"))
  }

  /** Shared scoring stream of [[denseRanks]]/[[denseRanksAgg]]:
    * `(query_id, doc_id, sim)` for every (query, candidate) pair,
    * self-hits excluded, sim rounded to 9 like every cosine ranker in
    * [[Similarity]]. distinct: a duplicated query id would fan the
    * join out and fill the top-k with repeated rows — dedup the tiny
    * frame defensively. */
  private def denseScored(embeddings: DataFrame, queryIds: DataFrame): DataFrame = {
    val queries = embeddings
      .join(broadcast(queryIds.select(col("query_id")).distinct()),
        col("vec_id") === col("query_id"))
      .select(col("query_id"), col("embedding").as("qv"))
    val cands = embeddings.select(col("vec_id").as("doc_id"),
      col("embedding").as("cv"))
    val sim = round(graft.functions.cosineSimilarity(col("qv"), col("cv")), 9)
    cands.join(broadcast(queries), col("query_id") =!= col("doc_id"))
      .select(col("query_id"), col("doc_id"), sim.as("sim"))
  }

  /** Reciprocal-rank fusion of a lexical and a dense ranking — the
    * standard hybrid-retrieval combiner (Cormack et al., SIGIR'09):
    * `score(q, d) = Σ_lists 1 / (kRrf + rank_list(d))`, here in exact
    * 2^20 fixed point (`S div (kRrf + rank)` per list, absent list
    * contributes 0) so both engines agree bit-for-bit. RRF needs only
    * RANKS, never the incomparable raw scores — which is exactly why
    * it is the production default for BM25 + embedding fusion in RAG
    * candidate mining.
    *
    * Inputs are two `(query_id, rank, doc_id)` rankings (extra columns
    * ignored); output the fused top-`k` per query:
    * `(query_id, rank, doc_id, score_rrf)`, ties on doc id.
    *
    * Scale: both inputs are top-k-per-query sized — |Q|·k rows — so the
    * full-outer join and the per-query re-rank window shuffle only
    * candidate-list-sized data regardless of corpus size; the corpus
    * never appears here. */
  def rrfFuse(lex: DataFrame, dense: DataFrame, k: Int,
      kRrf: Int = 60): DataFrame = {
    require(k > 0 && kRrf >= 0, s"need k > 0, kRrf >= 0; got $k, $kRrf")
    def contrib(side: DataFrame, name: String): DataFrame = side.select(
      col("query_id"), col("doc_id"),
      expr(s"${Scale}L div (${kRrf}L + rank)").as(name))
    val fused = contrib(lex, "c_lex")
      .join(contrib(dense, "c_dense"), Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(col("c_lex"), lit(0L)) +
          coalesce(col("c_dense"), lit(0L))).as("score_rrf"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score_rrf"))
  }

  /** Retrieval-quality scoreboard — the e72/e83/e87 measured-not-
    * folklore discipline applied to the retrieval family: each named
    * ranking `(query_id, rank, doc_id)` (top-`k` per query) scored
    * against a relevance truth `(query_id, doc_id)` as micro
    * precision@k, micro recall@k, and MRR. Every count is an exact
    * integer (hits = one equi-join count; the MRR numerator is the
    * fixed-point `Σ_q Scale div firstHitRank_q`), and each reported
    * ratio is ONE double division of two exact integers, so the SQL
    * oracle replays the arithmetic bit-for-bit. Queries with no hit
    * contribute 0 to MRR; `queries` (a 1-column `query_id` frame)
    * fixes the denominators — every query is expected to carry ≥ 1
    * relevant doc (the truth-derived query-set contract).
    *
    * Scale shape: rankings are |Q|·k-sized and truth is qrels-sized
    * by definition, so every join here is candidate-list-sized; the
    * 1-row count aggregates broadcast onto each scoreboard row (the
    * e66/e83 class). Output, one row per ranking in input order:
    * (method, k, n_queries, n_relevant, hits, mrr_fp, precision_at_k,
    * recall_at_k, mrr). */
  def scoreboard(rankings: Seq[(String, DataFrame)], truth: DataFrame,
      queries: DataFrame, k: Int): DataFrame = {
    require(rankings.nonEmpty, "scoreboard needs at least one ranking")
    require(k > 0, s"k must be positive, got $k")
    val rel = truth.select(col("query_id"), col("doc_id"))
    val nQ = queries.select(col("query_id")).distinct()
      .agg(count(lit(1)).as("n_queries"))
    val nRel = rel.agg(count(lit(1)).as("n_relevant"))
    rankings.map { case (name, ranking) =>
      val hits = ranking.where(col("rank") <= k)
        .join(rel, Seq("query_id", "doc_id"))
      val nHits = hits.agg(coalesce(count(lit(1)), lit(0L)).as("hits"))
      val mrr = hits.groupBy("query_id").agg(min(col("rank")).as("_fr"))
        .agg(coalesce(sum(expr(s"${Scale}L div _fr")), lit(0L)).as("mrr_fp"))
      nQ.crossJoin(broadcast(nRel)).crossJoin(broadcast(nHits))
        .crossJoin(broadcast(mrr))
        .select(lit(name).as("method"), lit(k.toLong).as("k"),
          col("n_queries"), col("n_relevant"), col("hits"), col("mrr_fp"),
          (col("hits").cast("double") /
            (col("n_queries") * lit(k.toLong)).cast("double"))
            .as("precision_at_k"),
          (col("hits").cast("double") / col("n_relevant").cast("double"))
            .as("recall_at_k"),
          (col("mrr_fp").cast("double") /
            (col("n_queries") * lit(Scale)).cast("double")).as("mrr"))
    }.reduceLeft(_ unionAll _)
  }
}
