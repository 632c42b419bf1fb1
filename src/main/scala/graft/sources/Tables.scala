package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped reader memo for the READ-ONLY fixture tables.
  *
  * `spark.read.parquet(path)` re-runs file listing + footer schema
  * inference on every call — measured **~84 ms per call** on this host
  * (a `GraphLoader.tpch` build pays it six times = ~450 ms, most of the
  * per-query driver floor; the bench constructs every query 4× per
  * sweep, so the suite re-infers the same six immutable schemas
  * thousands of times). Real deployments put this metadata in a catalog
  * or manifest precisely so readers never re-list (guide §6); this memo
  * is the path-based equivalent: ONE analyzed `DataFrame` per
  * (session, path), reused across queries.
  *
  * Scope contract: fixture inputs only — paths queries never write.
  * Paths written in-session (q14's persist target, Verify output dirs)
  * must NOT go through this memo: their file sets change between reads
  * and a cached `InMemoryFileIndex` would serve stale (deleted) splits.
  * Nothing is cached but driver-side METADATA (file list + schema) —
  * every action still scans the parquet bytes; results are never
  * memoized.
  */
object Tables {

  private val cache = new ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** The memoized batch reader. Thread-safe; one entry per
    * (session, path). */
  def read(spark: SparkSession, path: String): DataFrame =
    cache.computeIfAbsent((spark, path), _ => spark.read.parquet(path))
}
