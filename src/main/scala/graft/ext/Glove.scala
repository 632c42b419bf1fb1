package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine WORD-VECTOR TRAINING over the co-occurrence statistics the
  * corpus generators (e67–e70) already produce — the capstone of the
  * embedding family: GloVe-style weighted-least-squares factorization
  * (Pennington et al. 2014) of the log co-occurrence matrix,
  * `w_i · c_j ≈ log2 X_ij`, by full-batch gradient descent in EXACT
  * fixed-point integer arithmetic.
  *
  * Determinism contract (the [[Classify.perceptronTrain]] discipline
  * applied to factorization): every quantity is a `long` at scale
  * `2^Shift`; every scale division is an ARITHMETIC RIGHT SHIFT —
  * `shiftright` in Spark, `>>` in DuckDB, both floor toward -inf on
  * negatives (verified; integer `div`/`//` would disagree on rounding
  * direction between engines) — so the whole training run is
  * bit-identical under any partitioning and replays as chained DuckDB
  * CTEs. Initial vectors are md5-derived (`(md5(side:t:k) mod 8191 -
  * 4095) * 16`, i.e. ±2^16 ≈ ±1/16 at scale), the [[Sampling]] hash
  * discipline applied to initialization. Deviations from the paper,
  * stated: uniform loss weights (the distance discount is already in
  * `weight_fp`), no bias terms, and the target is floor-log2 (the e52
  * `bin()`-length fixed-point log) rather than natural log — same
  * factorization structure, exactly replayable arithmetic.
  *
  * Scale shape (100 TB corpus, |V| up to 10⁹): state is `(side, t, k,
  * v)` — 2·|V|·dims rows, never collected, never broadcast. Each round
  * is three token-keyed equi-join + aggregate passes over `pairs × dims`
  * rows (score, then one gradient pass per side), all map-side
  * combined; loop state crosses rounds through [[graft.plans.Supersteps.cut]]
  * (one action per round, linear lineage). Nothing in the loop sorts
  * globally or broadcasts model state.
  *
  * Overflow bound: `|v| < 2^24` (asserted by the GloveSpec law on the
  * fixture) keeps the per-pair product under 2^48 and a 2^14-degree
  * context sum under 2^62.
  */
object Glove {

  /** Fixed-point scale exponent: values are longs at scale 2^20. */
  val Shift = 20

  /** Targets from a [[Text.cooccurrence]] frame: `(i, j, tgt)` with
    * `tgt = (floor(log2(weight_fp)) - Shift) << Shift` — the
    * fixed-point log2 of the (distance-discounted) co-occurrence
    * count. Row-local. */
  def logTargets(cooc: DataFrame, centerCol: String = "center",
      contextCol: String = "context",
      weightCol: String = "weight_fp"): DataFrame =
    cooc.select(col(centerCol).as("i"), col(contextCol).as("j"),
      ((length(bin(col(weightCol))) - lit(1) - lit(Shift)).cast("long")
        * lit(1L << Shift)).as("tgt"))

  /** Deterministic md5 initial state over `vocab` (single column `t`):
    * `(side, t, k, v)` for side ∈ {w, c}, k ∈ [0, dims). */
  def initVectors(vocab: DataFrame, dims: Int): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    vocab.select(col("t"), explode(array(lit("w"), lit("c"))).as("side"))
      .select(col("side"), col("t"),
        explode(sequence(lit(0L), lit((dims - 1).toLong))).as("k"))
      .withColumn("v",
        (conv(substring(md5(concat_ws(":", col("side"), col("t"), col("k"))),
          1, 15), 16, 10).cast("long") % 8191L - 4095L) * 16L)
  }

  /** Per-pair residuals under `state`: `(i, j, e)` with
    * `e = (Σ_k w_ik·c_jk >> Shift) - tgt_ij`. */
  private def residuals(pairs: DataFrame, state: DataFrame): DataFrame = {
    val wv = state.where(col("side") === "w")
      .select(col("t").as("i"), col("k"), col("v").as("_wv"))
    val cv = state.where(col("side") === "c")
      .select(col("t").as("j"), col("k"), col("v").as("_cv"))
    pairs.join(wv, Seq("i")).join(cv, Seq("j", "k"))
      .groupBy("i", "j", "tgt")
      .agg(sum(col("_wv") * col("_cv")).as("_dot"))
      .select(col("i"), col("j"),
        (shiftright(col("_dot"), Shift) - col("tgt")).as("e"))
  }

  /** Every state of a training run: element r is the state after r
    * rounds (element 0 = the md5 init), each superstep-cut. The loop
    * update is `v -= (Σ e·other) >> (Shift + etaShift)` — the gradient
    * scale division and the 2^-etaShift learning rate folded into ONE
    * floor shift. */
  def trainStates(cooc: DataFrame, dims: Int = 4, rounds: Int = 3,
      etaShift: Int = 6): Seq[DataFrame] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(etaShift >= 0, s"etaShift must be >= 0, got $etaShift")
    val pairs = logTargets(cooc).localCheckpoint()
    val vocab = pairs.select(col("i").as("t"))
      .unionByName(pairs.select(col("j").as("t"))).distinct()
    var state = graft.plans.Supersteps.cut(initVectors(vocab, dims))
    val out = Seq.newBuilder[DataFrame]
    out += state
    for (_ <- 1 to rounds) {
      val err = residuals(pairs, state)
      val wv = state.where(col("side") === "w")
        .select(col("t").as("i"), col("k"), col("v").as("_wv"))
      val cv = state.where(col("side") === "c")
        .select(col("t").as("j"), col("k"), col("v").as("_cv"))
      val gw = err.join(cv, Seq("j"))
        .groupBy(col("i"), col("k"))
        .agg(sum(col("e") * col("_cv")).as("_g"))
        .select(lit("w").as("side"), col("i").as("t"), col("k"), col("_g"))
      val gc = err.join(wv, Seq("i"))
        .groupBy(col("j"), col("k"))
        .agg(sum(col("e") * col("_wv")).as("_g"))
        .select(lit("c").as("side"), col("j").as("t"), col("k"), col("_g"))
      state = graft.plans.Supersteps.cut(
        state.join(gw.unionByName(gc), Seq("side", "t", "k"), "left")
          .select(col("side"), col("t"), col("k"),
            (col("v") - shiftright(coalesce(col("_g"), lit(0L)),
              Shift + etaShift)).as("v")))
      out += state
    }
    out.result()
  }

  /** Final trained vectors `(side, t, k, v)`. */
  def train(cooc: DataFrame, dims: Int = 4, rounds: Int = 3,
      etaShift: Int = 6): DataFrame =
    trainStates(cooc, dims, rounds, etaShift).last

  /** Fixed-point squared-error loss `Σ e²` of `state` against the
    * co-occurrence targets — the GloveSpec descent law's measurement.
    * One bounded action (a single-row aggregate). */
  def loss(cooc: DataFrame, state: DataFrame): Long =
    residuals(logTargets(cooc), state)
      .agg(coalesce(sum(col("e") * col("e")), lit(0L)).as("l"))
      .head().getLong(0)
}
