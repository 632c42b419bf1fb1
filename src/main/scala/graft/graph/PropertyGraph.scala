package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Direction, EdgeSpec, GraphColumns => GC}
import graft.operators.TraversalResult

/** A labeled property graph held as one DataFrame per vertex label and one
  * DataFrame per (edge label, src label, dst label) adjacency partition.
  *
  * Reference model: TorcGraph.java:71-85 (labeled property graph with
  * string labels and property maps); adjacency partitioned by
  * (edgeLabel, direction, neighborLabel) (TorcHelper.java:352-370).
  * Keeping one frame per `EdgeSpec` preserves that partitioning logically:
  * a traversal that names an edge label and neighbor labels touches only
  * the matching frames — the Spark analogue of the reference's keyed
  * adjacency reads, and equivalent to partition pruning on
  * (edge_label, src_label, dst_label) when the frames are backed by a
  * partitioned Parquet layout (SURVEY.md §4).
  *
  * Unlike the reference (which forbids full scans, TorcGraph.java:368-370),
  * scans here are native and point lookups are filters — the inversion
  * called out in SURVEY.md §1.1.
  *
  * Each vertex frame carries `_vid: bigint` (the natural key within the
  * label's id space) plus its natural property columns. Each edge frame
  * carries `_src`, `_dst` plus edge property columns. Full 128-bit ids
  * (hi = label-space id, lo = natural key) are materialized only in the
  * generic `unifiedVertices` / `unifiedEdges` views — hot paths join on
  * plain longs, which Tungsten handles fastest.
  */
final class PropertyGraph(
    val spark: SparkSession,
    val vertexFrames: Map[String, DataFrame],
    val edgeFrames: Map[EdgeSpec, DataFrame]) {

  /** Graph-level metadata KV store — TinkerPop `graph.variables()`
    * (persisted/restored as a sidecar by GraphLoader persist/open). */
  val variables: GraphVariables = new GraphVariables

  /** Stable label -> id-space mapping (hi half of the 128-bit id). */
  lazy val labelIds: Map[String, Long] =
    vertexFrames.keys.toSeq.sorted.zipWithIndex.map { case (l, i) => l -> (i + 1).toLong }.toMap

  def vertexLabels: Seq[String] = vertexFrames.keys.toSeq.sorted
  def edgeSpecs: Seq[EdgeSpec] = edgeFrames.keys.toSeq.sortBy(s => (s.label, s.srcLabel, s.dstLabel))

  /** TinkerPop-style capability matrix (`Graph.features()` — the
    * reference declares its own at TorcGraph.java:1818-2215). Constant
    * across instances; see [[Features]] for where the engine's flags
    * deliberately differ from the reference's. */
  def features: Features.GraftFeatures = Features.matrix

  /** All vertices of a label (scan). */
  def vertices(label: String): DataFrame = vertexFrames(label)

  /** Point lookup by ids — the reference's `vertices(Object... ids)`
    * (TorcGraph.java:327-373) becomes a filter that Catalyst pushes into
    * the Parquet scan. Misses are simply absent (no rows). */
  def verticesById(label: String, ids: Seq[Long]): DataFrame =
    vertexFrames(label).where(col(GC.Id).isin(ids: _*))

  /** A frontier (id set) of every vertex of a label. */
  def frontier(label: String): DataFrame =
    vertexFrames(label).select(col(GC.Id))

  /** [[traverse]] from EVERY vertex of a label — the full-frontier fast
    * path. Joining an edge frame against the complete vertex-id list is
    * a no-op under referential integrity but costs a full shuffle (or a
    * giant broadcast) of the fact-side edge table at scale; expanding
    * from "all vertices" reads the adjacency partitions directly
    * instead. Results are identical to
    * `traverse(frontier(label), label, ...)` whenever every edge
    * endpoint exists in the vertex frame (which [[GraphLoader]] layouts
    * guarantee); the oracle-checked inventory queries prove the
    * equivalence on the fixtures. */
  def traverseAll(
      frontierLabel: String,
      edgeLabel: String,
      dir: Direction,
      fillEdge: Boolean = false,
      neighborLabels: Seq[String] = Nil): TraversalResult =
    traverse(null, frontierLabel, edgeLabel, dir, fillEdge, neighborLabels)

  /** Core operator: batched 1-hop expansion of a vertex set along
    * (edgeLabel, direction, neighborLabels) — the reference's `traverse`
    * (TorcGraph.java:479-585). The frontier-edges equi join IS the
    * reference's `TorcEdgeList.batchRead` batching (TorcEdgeList.java:
    * 920-1401): Spark's shuffle/broadcast machinery replaces hand-rolled
    * async read batching (SURVEY.md §3.4).
    *
    * @param frontier DataFrame with column `_vid` (set semantics: callers
    *                 pass unique ids, as the reference dedups frontiers
    *                 before fetch, TorcVertexStep.java:87-100)
    * @param frontierLabel label of the frontier vertices
    * @param fillEdge when true, edge property columns are kept
    *                 (reference `fillEdge`, TorcGraph.java:479)
    * @param neighborLabels labels to expand to; empty = all known specs
    *                 (the reference *requires* neighbor labels,
    *                 TorcGraph.java:853-859 — we relax that since label
    *                 pruning here is an optimization, not a correctness
    *                 requirement)
    */
  def traverse(
      frontier: DataFrame,
      frontierLabel: String,
      edgeLabel: String,
      dir: Direction,
      fillEdge: Boolean = false,
      neighborLabels: Seq[String] = Nil): TraversalResult = {

    // null frontier = the traverseAll fast path: no frontier join at all
    val f = Option(frontier).map(_.select(col(GC.Id).as("_fid"))).orNull

    def expand(outbound: Boolean): Seq[DataFrame] = {
      val specs = edgeFrames.keys.toSeq
        .filter(_.label == edgeLabel)
        .filter(s => (if (outbound) s.srcLabel else s.dstLabel) == frontierLabel)
        .filter(s => neighborLabels.isEmpty ||
          neighborLabels.contains(if (outbound) s.dstLabel else s.srcLabel))
        .sortBy(s => (s.srcLabel, s.dstLabel))
      specs.map { spec =>
        val e = edgeFrames(spec)
        val joinCol = if (outbound) GC.Src else GC.Dst
        val joined = if (f == null) e else e.join(f, e(joinCol) === f("_fid"))
        val (srcId, dstId, dstLab) =
          if (outbound) (e(GC.Src), e(GC.Dst), spec.dstLabel)
          else (e(GC.Dst), e(GC.Src), spec.srcLabel)
        val base = Seq(
          srcId.as(GC.Src),
          lit(frontierLabel).as(GC.SrcLabel),
          dstId.as(GC.Dst),
          lit(dstLab).as(GC.DstLabel))
        // plain col(), not e(col): dataset-tagged refs survive into the
        // projected output and trip DetectAmbiguousSelfJoin when callers
        // later re-reference the prop columns by name (e.g. rollup)
        val props = if (fillEdge) propColumns(spec).map(col) else Nil
        joined.select(base ++ props: _*)
      }
    }

    val parts = dir match {
      case Direction.Out  => expand(outbound = true)
      case Direction.In   => expand(outbound = false)
      // BOTH = OUT union IN, each stored direction counted once — plain
      // union, not distinct (TorcGraph.java:861-875; SURVEY.md §7.4).
      case Direction.Both => expand(outbound = true) ++ expand(outbound = false)
    }
    require(parts.nonEmpty,
      s"no adjacency for ($edgeLabel, $dir, $frontierLabel -> $neighborLabels)")

    val df = parts.reduce(_.unionByName(_, allowMissingColumns = true))
    val propCols = if (fillEdge) df.columns.toSeq.filterNot(TraversalResult.CoreCols.contains) else Nil
    TraversalResult(df, propCols)
  }

  /** Batch property hydration — the reference's `fillProperties`
    * (TorcGraph.java:587-734, multiread batches of 2048): a join against
    * the label's vertex frame; Catalyst column pruning plays the role of
    * the single-key projection path (TorcGraph.java:693-697).
    *
    * @param df any DataFrame; @param idCol its vertex-id column
    * @param label vertex label to hydrate from
    * @param keys property columns to attach (empty = all)
    */
  def hydrate(df: DataFrame, idCol: String, label: String, keys: Seq[String] = Nil): DataFrame = {
    val v = vertexFrames(label)
    val wanted = if (keys.isEmpty) v.columns.toSeq.filterNot(_ == GC.Id) else keys
    val proj = v.select(col(GC.Id).as("_hid") +: wanted.map(col): _*)
    df.join(proj, df(idCol) === proj("_hid")).drop("_hid")
  }

  /** Vertex-induced subgraph — the Gremlin `subgraph()` side-effect step
    * (inherited step library, reference pom.xml:19-27) re-expressed for
    * a batch engine: TinkerPop's step collects traversed edges into a
    * driver-held TinkerGraph; the induced form takes an element SET and
    * keeps every edge whose BOTH endpoints survive, and the result is a
    * full [[PropertyGraph]] over filtered frames — traversable,
    * hydratable, persistable (`GraphLoader.persist`/`persistBucketed`),
    * never driver-materialized. Each vertex frame is one semi-join and
    * each adjacency partition two, all equi-joins on the id — the
    * extraction scales exactly like a hop, so carving a working
    * neighborhood out of a 100-TB graph and bucketing it for repeated
    * analysis is one pass over the adjacency.
    *
    * @param vertices any (id, label) frame — a traversal frontier, an
    *   `aggregate()` collection
    * @param materialize localCheckpoint the element set first: the set
    *   feeds 2·|specs| + |labels| semi-joins, each of which would
    *   otherwise re-execute its plan (the q33 materialization
    *   discipline) — turn on when the set is computed by a non-trivial
    *   traversal. */
  def inducedSubgraph(vertices: DataFrame,
      materialize: Boolean = false): PropertyGraph = {
    val distinct = vertices.select(col(GC.Id), col(GC.Label))
      .dropDuplicates(GC.Id, GC.Label)
    val set = if (materialize) distinct.localCheckpoint() else distinct
    def labelSet(l: String): DataFrame =
      set.where(col(GC.Label) === l).select(col(GC.Id).as("_kid"))
    val vs = vertexFrames.map { case (l, v) =>
      l -> v.join(labelSet(l), v(GC.Id) === col("_kid"), "left_semi")
    }
    val es = edgeFrames.map { case (spec, e) =>
      val srcKept = e.join(labelSet(spec.srcLabel),
        e(GC.Src) === col("_kid"), "left_semi")
      spec -> srcKept.join(labelSet(spec.dstLabel),
        srcKept(GC.Dst) === col("_kid"), "left_semi")
    }
    new PropertyGraph(spark, vs, es)
  }

  /** Generic single-table view of all vertices:
    * `(id: struct<hi,lo>, label: string, props: map<string,string>)` —
    * the reference's untyped property-map model (TorcGraph.java:71-85,
    * string-valued properties per feature flags TorcGraph.java:2115-2118).
    * For generic/point-op parity and tests; analytical queries use the
    * typed per-label frames. */
  def unifiedVertices: DataFrame = {
    val frames = vertexLabels.map { label =>
      val v = vertexFrames(label)
      val propCols = v.columns.toSeq.filterNot(_ == GC.Id)
      val kvs = propCols.flatMap(c => Seq(lit(c), col(c).cast("string")))
      v.select(
        graft.functions.uint128(lit(labelIds(label)), col(GC.Id)).as("id"),
        lit(label).as("label"),
        (if (kvs.isEmpty) map() else map(kvs: _*)).as("props"))
    }
    frames.reduce(_.unionByName(_))
  }

  /** Generic edge view: `(src, dst, label, src_label, dst_label, props)`. */
  def unifiedEdges: DataFrame = {
    val frames = edgeSpecs.map { spec =>
      val e = edgeFrames(spec)
      val props = propColumns(spec)
      val kvs = props.flatMap(c => Seq(lit(c), col(c).cast("string")))
      e.select(
        graft.functions.uint128(lit(labelIds(spec.srcLabel)), col(GC.Src)).as("src"),
        graft.functions.uint128(lit(labelIds(spec.dstLabel)), col(GC.Dst)).as("dst"),
        lit(spec.label).as("label"),
        lit(spec.srcLabel).as("src_label"),
        lit(spec.dstLabel).as("dst_label"),
        (if (kvs.isEmpty) map() else map(kvs: _*)).as("props"))
    }
    frames.reduce(_.unionByName(_))
  }

  private def propColumns(spec: EdgeSpec): Seq[String] =
    edgeFrames(spec).columns.toSeq.filterNot(c => c == GC.Src || c == GC.Dst)
}
