package graft.analytics

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.graph.PropertyGraph
import graft.model.{GraphColumns => GC}

/** GraphX view of a [[PropertyGraph]] for iterative analytics
  * (connected components, PageRank, Pregel) — the "graph analytics could
  * use GraphX" half of the port posture (SURVEY.md §7.0): the reference
  * explicitly has no OLAP/GraphComputer (`compute()` throws,
  * TorcGraph.java:315-323), so iterative algorithms are an extension
  * surface, not parity.
  *
  * GraphX vertex ids are Longs: the 128-bit (labelSpace, naturalKey) id
  * packs as `labelId << 48 | key` — 16 bits of label space and 48 bits of
  * key, enough for fixture-scale keys; at full scale use a dense id
  * relabeling pass (zipWithUniqueId) instead, the standard GraphX
  * pattern.
  */
object GraphXBridge {

  val LabelShift = 48
  private val KeyMask = (1L << LabelShift) - 1

  def pack(labelId: Long, key: Long): VertexId = {
    require((key & ~KeyMask) == 0, s"vertex key $key exceeds 48 bits")
    (labelId << LabelShift) | key
  }
  def unpackLabel(v: VertexId): Long = v >>> LabelShift
  def unpackKey(v: VertexId): Long = v & KeyMask

  /** Build the GraphX graph: VD = (label, naturalKey), ED = edge label. */
  def toGraphX(g: PropertyGraph): Graph[(String, Long), String] = {
    val ids = g.labelIds
    val vertices = g.vertexLabels.map { l =>
      val lid = ids(l)
      g.vertices(l).select(col(GC.Id)).rdd.map { (r: Row) =>
        val key = r.getLong(0)
        (pack(lid, key), (l, key))
      }
    }.reduce(_ union _)
    val edges = g.edgeSpecs.map { spec =>
      val (slid, dlid) = (ids(spec.srcLabel), ids(spec.dstLabel))
      g.edgeFrames(spec).select(col(GC.Src), col(GC.Dst)).rdd.map { (r: Row) =>
        Edge(pack(slid, r.getLong(0)), pack(dlid, r.getLong(1)), spec.label)
      }
    }.reduce(_ union _)
    Graph(vertices, edges)
  }

  /** Dense-id GraphX view for graphs whose natural keys exceed the
    * 48-bit packed space: every (label, key) pair is relabeled to a
    * contiguous Long via `zipWithUniqueId` (the standard GraphX
    * pattern), and edges translate src/dst through the id map with two
    * key-partitioned joins — no driver-side map, so the relabeling
    * itself scales to any vertex count. */
  def toGraphXDense(g: PropertyGraph): Graph[(String, Long), String] = {
    val ids = g.labelIds
    val naturals = g.vertexLabels.map { l =>
      val lid = ids(l)
      g.vertices(l).select(col(GC.Id)).rdd.map((r: Row) => ((lid, r.getLong(0)), l))
    }.reduce(_ union _)
    val idMap = naturals.zipWithUniqueId()
      .map { case (((lid, key), l), dense) => ((lid, key), (dense, l)) }
      .cache() // reused by the vertex build and both edge-endpoint joins
    val vertices = idMap.map { case ((_, key), (dense, l)) => (dense, (l, key)) }
    val edges = g.edgeSpecs.map { spec =>
      val (slid, dlid) = (ids(spec.srcLabel), ids(spec.dstLabel))
      g.edgeFrames(spec).select(col(GC.Src), col(GC.Dst)).rdd
        .map((r: Row) => ((slid, r.getLong(0)), (dlid, r.getLong(1), spec.label)))
    }.reduce(_ union _)
      .join(idMap)
      .map { case (_, ((dlid, dstKey, lbl), (srcDense, _))) =>
        ((dlid, dstKey), (srcDense, lbl)) }
      .join(idMap)
      .map { case (_, ((srcDense, lbl), (dstDense, _))) =>
        Edge(srcDense, dstDense, lbl) }
    Graph(vertices, edges)
  }

  /** Connected components over the dense view — usable with natural keys
    * of any magnitude. The component representative is the MINIMUM
    * (label_id, key) pair in the component (not a dense id, which is
    * partition-layout dependent), so output is deterministic and
    * id-space independent. Output:
    * `(label_id, _vid, comp_label_id, comp_vid)`. */
  def connectedComponentsDense(g: PropertyGraph): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val ids = g.labelIds
    val base = toGraphXDense(g)
    val byDense = base.vertices.mapValues { case (l, k) => (ids(l), k) }
    val tagged = base.connectedComponents().vertices.join(byDense)
      .map { case (_, (compDense, (lid, key))) => (compDense, (lid, key)) }
    val reps = tagged.reduceByKey { (a, b) =>
      if (a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)) a else b
    }
    tagged.join(reps)
      .map { case (_, ((lid, key), (clid, ckey))) => (lid, key, clid, ckey) }
      .toDF("label_id", GC.Id, "comp_label_id", "comp_vid")
  }

  /** Connected components over the whole property graph, back as a
    * DataFrame `(label, _vid, component)`. */
  def connectedComponents(g: PropertyGraph): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    toGraphX(g).connectedComponents().vertices
      .map { case (vid, comp) => (unpackLabel(vid), unpackKey(vid), comp) }
      .toDF("label_id", GC.Id, "component")
  }

  /** Triangle count per vertex (GraphX's triangleCount: each vertex's
    * number of closing edge triples; graph treated as undirected with
    * canonical edge orientation as the algorithm requires). Back as
    * `(label_id, _vid, triangles)`. */
  def triangleCounts(g: PropertyGraph): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    toGraphX(g)
      .partitionBy(org.apache.spark.graphx.PartitionStrategy.EdgePartition2D)
      .triangleCount().vertices
      .map { case (vid, n) => (unpackLabel(vid), unpackKey(vid), n.toLong) }
      .toDF("label_id", GC.Id, "triangles")
  }

  /** Community detection via GraphX label propagation (`lib
    * .LabelPropagation`, Raghavan et al. 2007): each vertex adopts the
    * most frequent community label among its neighbors for `iters`
    * supersteps. Non-deterministic on tie-heavy graphs by nature (ties
    * break on label value) — use for exploratory structure, not oracle
    * comparison. Back as `(label_id, _vid, community)`. */
  def labelPropagation(g: PropertyGraph, iters: Int = 5): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    org.apache.spark.graphx.lib.LabelPropagation.run(toGraphX(g), iters)
      .vertices
      .map { case (vid, comm) => (unpackLabel(vid), unpackKey(vid), comm) }
      .toDF("label_id", GC.Id, "community")
  }

  /** Single-source hop distances via Pregel — the iterative-fixpoint
    * message-passing operator (BFS as min-plus supersteps). Treats the
    * graph as undirected when `undirected` (each edge messages both
    * ways). Unreachable vertices are absent. Back as
    * `(label_id, _vid, dist)`. */
  def hopDistances(g: PropertyGraph, srcLabel: String, srcId: Long,
      undirected: Boolean = true): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val base = toGraphX(g)
    val edges =
      if (undirected)
        base.edges.union(base.edges.map(e => Edge(e.dstId, e.srcId, e.attr)))
      else base.edges
    val src = pack(g.labelIds(srcLabel), srcId)
    val init = Graph(base.vertices, edges)
      .mapVertices((vid, _) => if (vid == src) 0.0 else Double.PositiveInfinity)
    val res = init.pregel(Double.PositiveInfinity)(
      (_, d, m) => math.min(d, m),
      t => if (t.srcAttr + 1.0 < t.dstAttr) Iterator((t.dstId, t.srcAttr + 1.0))
           else Iterator.empty,
      (a, b) => math.min(a, b))
    res.vertices
      .filter { case (_, d) => d < Double.PositiveInfinity }
      .map { case (vid, d) => (unpackLabel(vid), unpackKey(vid), d.toLong) }
      .toDF("label_id", GC.Id, "dist")
  }

  /** Fixed-iteration PageRank (GraphX `staticPageRank`, damping 0.85)
    * — the exact-algorithm twin of
    * [[graft.analytics.Iterative.pageRank]] for parity testing. Back
    * as `(label_id, _vid, rank)`. */
  def pageRankStatic(g: PropertyGraph, iters: Int): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    toGraphX(g).staticPageRank(iters).vertices
      .map { case (vid, rank) => (unpackLabel(vid), unpackKey(vid), rank) }
      .toDF("label_id", GC.Id, "rank")
  }

  /** PageRank (graph-wide, damping 0.85), back as
    * `(label_id, _vid, rank)`. */
  def pageRank(g: PropertyGraph, tol: Double = 1e-4): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    toGraphX(g).pageRank(tol).vertices
      .map { case (vid, rank) => (unpackLabel(vid), unpackKey(vid), rank) }
      .toDF("label_id", GC.Id, "rank")
  }
}
