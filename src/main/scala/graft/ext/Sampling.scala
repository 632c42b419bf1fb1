package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Spark's `sample()` is seed-based per-partition: the kept set changes
  * with partitioning and data layout, which breaks reproducible corpus
  * construction (re-running a 100 TB downsample must keep the SAME
  * documents, and adding a shard must not reshuffle earlier picks).
  * Content-hash sampling fixes membership to the KEY alone: a row is
  * kept iff a uniform 60-bit hash of its key falls under the fraction
  * threshold — stable across runs, partitionings, engines (md5-derived,
  * so the DuckDB oracle computes the identical sample).
  *
  * Scale shapes: [[hashSample]] is a pure codegen'd filter — no
  * shuffle, constant memory, trivially parallel. [[stratifiedSample]]
  * is one shuffle on the strata key (the window's partition); strata
  * far larger than `n` stream through the window's running counter
  * without materializing.
  */
object Sampling {

  /** 60-bit hash space (15 md5 hex chars — fits a signed long; the same
    * engine-portable base hash as MinHash/SimHash). */
  val HashBits = 60

  /** Integer threshold for a sampling fraction: keep h < threshold,
    * h uniform in [0, 2^60). Computed once so the Spark filter and the
    * SQL oracle inline the identical literal. */
  def hashThreshold(fraction: Double): Long =
    (fraction * (1L << HashBits)).toLong

  private def keyHash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Deterministic Bernoulli sample: keep rows whose key hashes under
    * `fraction` of the hash space. Membership depends only on the key
    * value — never on seed, partitioning, or arrival order. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction outside [0, 1]")
    df.where(keyHash(key) < lit(hashThreshold(fraction)))
  }

  /** Deterministic fixed-size per-stratum sample: the `n` rows of each
    * stratum whose keys hash lowest (hash order = uniform random order,
    * but reproducible). Strata with fewer than `n` rows are kept whole —
    * the balanced-corpus primitive (n docs per language/source/bucket). */
  def stratifiedSample(df: DataFrame, strata: Seq[String], key: Column, n: Int): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(md5(key.cast("string")), key)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= n)
      .drop("_rn")
  }
}
