package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.{GraphColumns => GC}

/** Result of a batched traversal: one row per (source, neighbor) pair,
  * optionally carrying edge property columns.
  *
  * Reference: `TraversalResult{vMap, pMap, vSet}` (TraversalResult.java:
  * 26-39) — the per-source neighbor-list map, the parallel edge-property
  * map, and the deduped global neighbor set. A DataFrame of
  * `(_src, _src_label, _dst, _dst_label, eprops...)` subsumes all three:
  * `vMap` is the row set grouped by `_src`, `pMap` rides along as columns
  * (so semi/anti joins drop value+prop entries in lockstep — the fidelity
  * risk in SURVEY.md §7.4.1), and `vSet` is `select(_dst).distinct()`.
  *
  * The five client-side combinators the reference runs single-threaded in
  * memory (TorcHelper.java:416-646) become distributed joins/filters here.
  */
final case class TraversalResult(df: DataFrame, edgePropCols: Seq[String]) {

  /** Deduped neighbor set as a new frontier — reference `vSet`
    * (TorcGraph.java:538-571 `uniqNbrSet`). */
  def vSet: DataFrame =
    df.select(col(GC.Dst).as(GC.Id), col(GC.DstLabel).as(GC.Label)).distinct()

  /** Deduped neighbor ids only (single-label results). */
  def vSetIds: DataFrame = df.select(col(GC.Dst).as(GC.Id)).distinct()

  /** Source-key set — reference `TorcHelper.keylist`
    * (TorcHelper.java:640-646). */
  def keylist: DataFrame =
    df.select(col(GC.Src).as(GC.Id), col(GC.SrcLabel).as(GC.Label)).distinct()

  /** Hop composition — reference `TorcHelper.fuse` (TorcHelper.java:
    * 416-456): A: x->y composed with B: y->z gives x->z. With
    * `dedup=false` per-path multiplicity is preserved (row per path,
    * join multiplicity — TorcVertexStep re-fan-out semantics,
    * TorcVertexStep.java:123-130); with `dedup=true` distinct (x, z)
    * pairs remain and edge props are dropped (the reference dedups the
    * fused neighbor lists through a set).
    */
  def fuse(b: TraversalResult, dedup: Boolean): TraversalResult = {
    val a = df.alias("A")
    val bb = b.df.alias("B")
    val joined = a.join(bb,
      col(s"A.${GC.Dst}") === col(s"B.${GC.Src}") &&
      col(s"A.${GC.DstLabel}") === col(s"B.${GC.SrcLabel}"))
    val core = Seq(
      col(s"A.${GC.Src}").as(GC.Src),
      col(s"A.${GC.SrcLabel}").as(GC.SrcLabel),
      col(s"B.${GC.Dst}").as(GC.Dst),
      col(s"B.${GC.DstLabel}").as(GC.DstLabel))
    if (dedup)
      TraversalResult(joined.select(core: _*).distinct(), Nil)
    else
      TraversalResult(
        joined.select(core ++ b.edgePropCols.map(c => col(s"B.$c")): _*),
        b.edgePropCols)
  }

  /** Keep only pairs whose neighbor is in `set` — reference
    * `TorcHelper.intersect` (TorcHelper.java:466-539): a left-semi join.
    * `set` must carry `_vid` (and `_vlabel` if label-qualified).
    */
  def intersect(set: DataFrame): TraversalResult =
    copy(df = df.join(set, joinKeys(set), "left_semi"))

  /** Remove pairs whose neighbor is in `set` — reference
    * `TorcHelper.subtract` (TorcHelper.java:549-592): a left-anti join. */
  def subtract(set: DataFrame): TraversalResult =
    copy(df = df.join(set, joinKeys(set), "left_anti"))

  /** Drop pairs matching a predicate over (neighbor, edge props) —
    * reference `TorcHelper.removeEdgeIf` (TorcHelper.java:594-638).
    * The predicate is a Column expression (codegen'd), not a black-box
    * closure — the one place the reference accepts arbitrary user code
    * (SURVEY.md §2.2 UDF row). */
  def removeEdgeIf(cond: Column): TraversalResult = copy(df = df.filter(!cond))

  /** Keep pairs matching a predicate. */
  def filter(cond: Column): TraversalResult = copy(df = df.filter(cond))

  /** Per-source neighbor count — degree semantics over the result
    * (`TraversalResult.vMap` list sizes). */
  def degrees: DataFrame =
    df.groupBy(col(GC.Src).as(GC.Id)).agg(count(lit(1)).as("degree"))

  /** Per-source collected neighbor list (explicit vMap materialization;
    * list order is not defined — the reference's LIFO adjacency order is
    * replaced by explicit ORDER BY where queries need order,
    * SURVEY.md §7.4.2). */
  def vMap: DataFrame =
    df.groupBy(col(GC.Src).as(GC.Id)).agg(collect_list(col(GC.Dst)).as("neighbors"))

  private def joinKeys(set: DataFrame): Column = {
    val hasLabel = set.columns.contains(GC.Label)
    val idEq = df(GC.Dst) === set(GC.Id)
    if (hasLabel) idEq && df(GC.DstLabel) === set(GC.Label) else idEq
  }
}

object TraversalResult {
  val CoreCols: Set[String] = Set(GC.Src, GC.SrcLabel, GC.Dst, GC.DstLabel)
}
