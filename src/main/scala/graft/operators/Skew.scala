package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for supernode frontiers (SURVEY.md §7.4
  * risk 5: at 100 TB a hot key — a celebrity vertex, a boilerplate
  * shingle — funnels one shuffle partition).
  *
  * First line of defense is AQE's runtime skew-join splitting; explicit
  * salting is the structural fix when a single key exceeds what AQE can
  * split (it rewrites the join key space itself). The reference's
  * analogue was segment splitting in its adjacency lists
  * (TorcEdgeList.java:223-306).
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a deterministic salt in
    * [0, salts) derived from row identity, the small side is replicated
    * once per salt value, and the join key becomes (key, salt) — hot keys
    * spread over `salts` reducers. Result equals
    * `big.join(small, bigKey === smallKey, "inner")` with `small`'s
    * columns appended.
    *
    * Use when one side is small enough to replicate `salts` times but too
    * big (or too mismatched) to broadcast outright.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, salts: Int): DataFrame = {
    require(salts > 0)
    // Deterministic per-row salt: hash of the whole row spreads rows of
    // the SAME hot key across salt values (a key-derived salt would not).
    val salted = big.withColumn("_salt",
      pmod(hash(big.columns.map(col): _*), lit(salts)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) &&
        salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  /** Frequency-cap filter: drop join keys hotter than `maxCount` (the
    * stop-shingle / supernode cutoff for similarity self-joins, where a
    * universal key contributes O(n^2) pairs and no signal). Returns the
    * filtered frame; the dropped hot keys are available via
    * [[hotKeys]] for logging. */
  def capFrequency(df: DataFrame, key: String, maxCount: Long): DataFrame = {
    val hot = hotKeys(df, key, maxCount)
    df.join(hot, Seq(key), "left_anti")
  }

  def hotKeys(df: DataFrame, key: String, maxCount: Long): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("_cnt"))
      .where(col("_cnt") > maxCount).select(key)
}
