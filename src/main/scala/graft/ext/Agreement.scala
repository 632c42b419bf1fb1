package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rank-agreement diagnostics for quality scorers: when a curation
  * stack carries several quality signals (rule flags, a trained
  * classifier, an LM perplexity), the first question is whether the
  * CHEAP one can gate for the EXPENSIVE one — answered by rank
  * correlation, not by comparing incomparable score scales.
  */
object Agreement {

  /** Global rank of `df` under the total order `order` WITHOUT a
    * partition-less Window (the one plan shape that cannot survive a
    * 100-TB input — PlanAuditSpec gates it suite-wide): `bucket` must
    * be a MONOTONE non-strict coarsening of the LEADING sort column
    * (bucket order never contradicts score order — clamped range
    * buckets qualify); ranking is then a bucket-partitioned
    * row_number over the FULL sort key plus cross-bucket count
    * offsets resolved by a triangular join over the bounded bucket
    * histogram (the [[Text.skipgramPairs]] two-phase form — a bounded
    * NLJ, never a single-task sort). The bucket choice affects ONLY
    * the plan, never the ranks: any monotone coarsening yields the
    * identical global position, so the SQL oracle may rank with a
    * plain global window. Appends `_rk` (1-based, dense by
    * construction when `order` is total). */
  def globalRank(df: DataFrame, bucket: Column, order: Seq[Column]): DataFrame = {
    require(order.nonEmpty, "globalRank needs at least one sort column")
    val b = df.withColumn("_b", bucket)
    val hist = b.groupBy("_b").agg(count(lit(1)).as("_bc"))
    val offs = hist.join(
        hist.select(col("_b").as("_b2"), col("_bc").as("_m2")),
        col("_b2") < col("_b"), "left")
      .groupBy("_b").agg(coalesce(sum(col("_m2")), lit(0L)).as("_off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_b")).orderBy(order: _*)
    b.withColumn("_rn", row_number().over(w).cast("long"))
      .join(offs, Seq("_b"))
      .withColumn("_rk", col("_off") + col("_rn"))
      .drop("_b", "_rn", "_off")
  }

  /** Pairwise Cohen's kappa over named BINARY raters (each frame
    * `(idCol, flag)` with flag ∈ {0,1}) — the chance-corrected
    * agreement for keep/drop DECISIONS, complementing [[spearman]]'s
    * rank view: two gates that both keep 90% agree 81% by chance
    * alone, and kappa is what's left after that. Computed exactly:
    * the 2×2 confusion counts are integer sums, and
    *
    *   kappa = (n·(both_pos + both_neg) − pe_num) / (n² − pe_num),
    *   pe_num = row-marginal · column-marginal products
    *
    * is evaluated as ONE double division of two DECIMAL(38,0)-exact
    * integers (n² overflows a long at ~3·10⁹ docs; identical
    * HUGEINT arithmetic on the oracle side), so both engines divide
    * the same two integers. Degenerate case (n² = pe_num: a rater is
    * constant) scores 0.0. Output, one row per unordered pair in
    * input order: (rater_a, rater_b, n, both_pos, both_neg, only_a,
    * only_b, kappa). Each pair is one id equi-join + a 1-row
    * aggregate. */
  def kappa(raters: Seq[(String, DataFrame)],
      idCol: String = "doc_id"): DataFrame = {
    require(raters.size >= 2, "kappa needs at least two raters")
    raters.combinations(2).map { pair =>
      val (na, da) = pair(0)
      val (nb, db) = pair(1)
      da.select(col(idCol), col("flag").as("_fa"))
        .join(db.select(col(idCol), col("flag").as("_fb")), idCol)
        .agg(count(lit(1)).as("n"),
          coalesce(sum(when(col("_fa") === 1 && col("_fb") === 1, 1L)
            .otherwise(0L)), lit(0L)).as("both_pos"),
          coalesce(sum(when(col("_fa") === 0 && col("_fb") === 0, 1L)
            .otherwise(0L)), lit(0L)).as("both_neg"),
          coalesce(sum(when(col("_fa") === 1 && col("_fb") === 0, 1L)
            .otherwise(0L)), lit(0L)).as("only_a"),
          coalesce(sum(when(col("_fa") === 0 && col("_fb") === 1, 1L)
            .otherwise(0L)), lit(0L)).as("only_b"))
        .withColumn("_pe", expr(
          "CAST(both_pos + only_a AS DECIMAL(38,0)) * (both_pos + only_b)" +
            " + CAST(only_b + both_neg AS DECIMAL(38,0)) * (only_a + both_neg)"))
        .select(lit(na).as("rater_a"), lit(nb).as("rater_b"),
          col("n"), col("both_pos"), col("both_neg"),
          col("only_a"), col("only_b"),
          expr("CASE WHEN CAST(n AS DECIMAL(38,0)) * n - _pe = 0 THEN 0.0" +
            " ELSE CAST(CAST(n AS DECIMAL(38,0)) * (both_pos + both_neg) - _pe AS DOUBLE)" +
            " / CAST(CAST(n AS DECIMAL(38,0)) * n - _pe AS DOUBLE) END")
            .as("kappa"))
    }.reduceLeft(_ unionAll _)
  }

  /** Pairwise Spearman rank correlation over named pre-ranked frames
    * (each `(idCol, _rk)` from [[globalRank]] under that scorer's
    * total order): rho = 1 - 6·Σd² / (n·(n²-1)) with d = rank
    * difference per shared id — integer-exact sums, one final
    * exact int/int double division (n = 1 or empty scores 0.0).
    * Output, one row per unordered pair in input order:
    * (scorer_a, scorer_b, n, sum_d2, spearman). Each pair is one
    * equi-join on the id + a 1-row aggregate — nothing rank-frame
    * sized ever broadcasts. */
  def spearman(ranked: Seq[(String, DataFrame)],
      idCol: String = "doc_id"): DataFrame = {
    require(ranked.size >= 2, "spearman needs at least two scorers")
    ranked.combinations(2).map { pair =>
      val (na, da) = pair(0)
      val (nb, db) = pair(1)
      da.select(col(idCol), col("_rk").as("_ra"))
        .join(db.select(col(idCol), col("_rk").as("_rb")), idCol)
        .agg(count(lit(1)).as("n"),
          coalesce(sum((col("_ra") - col("_rb")) * (col("_ra") - col("_rb"))),
            lit(0L)).as("sum_d2"))
        .select(lit(na).as("scorer_a"), lit(nb).as("scorer_b"),
          col("n"), col("sum_d2"),
          when(col("n") > 1,
            lit(1.0) - lit(6.0) * col("sum_d2").cast("double") /
              (col("n") * (col("n") * col("n") - lit(1L))).cast("double"))
            .otherwise(lit(0.0)).as("spearman"))
    }.reduceLeft(_ unionAll _)
  }
}
