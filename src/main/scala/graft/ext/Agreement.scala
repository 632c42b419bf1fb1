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
