package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.graph.PropertyGraph
import graft.model.{GraphColumns => GC}

/** DataFrame-native iterative whole-graph analytics — the Tungsten twin
  * of [[GraphXBridge]] for the two TinkerPop GraphComputer steps a
  * Gremlin user reaches for by name (`connectedComponent()`,
  * `pageRank()`; the inherited step library,
  * `/root/reference/pom.xml:19-27` — the reference itself throws on
  * `compute()`, TorcGraph.java:315-323, so this is extension surface).
  *
  * Both run the superstep discipline the rest of the engine uses
  * (one distributed join + `localCheckpoint` per round, `Observation`
  * for the convergence count so each round costs exactly ONE action —
  * the e29 lesson): rows stay in whole-stage codegen instead of GraphX's
  * RDD serialization, which is what lets the same loop run against a
  * 100-TB edge frame. Vertices ride as the packed 64-bit
  * `labelId << 48 | key` id ([[GraphXBridge.pack]]) so multi-label
  * graphs fold into one LongType column — comparisons stay primitive,
  * no struct shuffles. GraphX remains the fallback for adversarially
  * deep components (Pregel's large-star/small-star halves rounds).
  */
object Iterative {

  /** Packed-id expression for a STATICALLY-known label — pure literal
    * arithmetic (`labelId << 48 | key`), codegen'd, no when-chain: the
    * label of every frame fed to the loops is known from its
    * vertex-label / edge-spec key, so the pack folds to one OR. */
  private def packed(g: PropertyGraph, label: String, id: Column): Column =
    lit(g.labelIds(label) << GraphXBridge.LabelShift)
      .bitwiseOR(id.cast("bigint"))

  private def unpackLabelStr(g: PropertyGraph, v: Column): Column = {
    val byId = g.labelIds.map(_.swap)
    byId.foldLeft(lit(null).cast("string")) { case (acc, (lid, l)) =>
      when(shiftrightunsigned(v, GraphXBridge.LabelShift) === lid, lit(l))
        .otherwise(acc)
    }
  }

  private def unpackKey(v: Column): Column =
    v.bitwiseAND(lit((1L << GraphXBridge.LabelShift) - 1))

  /** Vertices of the given labels (all when empty) as one packed-id
    * frame `(_v)`. */
  private def packedVertices(g: PropertyGraph,
      labels: Set[String] = Set.empty): DataFrame =
    g.vertexLabels.filter(l => labels.isEmpty || labels.contains(l)).map { l =>
      g.vertices(l).select(packed(g, l, col(GC.Id)).as("_v"))
    }.reduce(_.unionByName(_))

  /** Vertex labels incident to the (possibly restricted) edge set —
    * the only labels the iterative loops need to carry: a vertex whose
    * label touches no retained edge spec is a singleton (components) /
    * an isolated 0.15-rank vertex (pageRank) and is emitted directly,
    * never joined. At 100 TB this is the difference between iterating
    * over the whole graph and iterating over the queried subgraph. */
  private def incidentLabels(g: PropertyGraph,
      edgeLabels: Set[String]): Set[String] =
    g.edgeSpecs.filter(s => edgeLabels.isEmpty || edgeLabels.contains(s.label))
      .flatMap(s => Seq(s.srcLabel, s.dstLabel)).toSet

  /** Edge frames (restricted to `edgeLabels` when non-empty) as packed
    * `(_s, _d)` pairs; `undirected` unions the reverse direction. */
  private def packedEdges(g: PropertyGraph, edgeLabels: Set[String],
      undirected: Boolean): DataFrame = {
    val specs = g.edgeSpecs.filter(s =>
      edgeLabels.isEmpty || edgeLabels.contains(s.label))
    require(specs.nonEmpty, s"no edge specs match $edgeLabels")
    val fwd = specs.map { spec =>
      g.edgeFrames(spec).select(
        packed(g, spec.srcLabel, col(GC.Src)).as("_s"),
        packed(g, spec.dstLabel, col(GC.Dst)).as("_d"))
    }.reduce(_.unionByName(_))
    if (undirected) fwd.unionByName(fwd.select(col("_d").as("_s"), col("_s").as("_d")))
    else fwd
  }

  /** Connected components (undirected) as the min-label loop over the
    * packed id space — each round one equi-join + map-side-combined min
    * aggregation, convergence observed on the round's single checkpoint
    * action. Rounds are bounded by the longest min-label propagation
    * chain (graph diameter). Output:
    * `(label, _vid, component_label, component_id)` — the component
    * representative is the packed-smallest member, so reruns agree
    * under any partitioning. */
  def connectedComponents(g: PropertyGraph,
      edgeLabels: Set[String] = Set.empty, maxIter: Int = 30): DataFrame = {
    val edges = packedEdges(g, edgeLabels, undirected = true).localCheckpoint()
    val touched = incidentLabels(g, edgeLabels)
    var labels = packedVertices(g, touched)
      .select(col("_v"), col("_v").as("_lbl")).localCheckpoint()
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val nbrMin = edges.join(labels, edges("_d") === labels("_v"))
        .groupBy(col("_s")).agg(min(col("_lbl")).as("_nl"))
      val obs = new org.apache.spark.sql.Observation(s"cc_it_$iter")
      val updated = labels.join(nbrMin, labels("_v") === nbrMin("_s"), "left")
        .select(labels("_v"),
          least(col("_lbl"), coalesce(col("_nl"), col("_lbl"))).as("_lbl"),
          (coalesce(col("_nl"), col("_lbl")) < col("_lbl")).as("_chg"))
        .observe(obs, sum(when(col("_chg"), 1L).otherwise(0L)).as("changed"))
        .localCheckpoint()
      done = obs.get("changed").asInstanceOf[Long] == 0L
      labels = updated.drop("_chg")
      iter += 1
    }
    val untouched = g.vertexLabels.toSet -- touched
    if (untouched.nonEmpty)
      labels = labels.unionByName(
        packedVertices(g, untouched).select(col("_v"), col("_v").as("_lbl")))
    labels.select(
      unpackLabelStr(g, col("_v")).as("label"),
      unpackKey(col("_v")).as(GC.Id),
      unpackLabelStr(g, col("_lbl")).as("component_label"),
      unpackKey(col("_lbl")).as("component_id"))
  }

  /** k-core decomposition (bounded peel): iteratively drop vertices
    * whose degree over the SURVIVING undirected edge multiset is below
    * `k`, up to `maxRounds` times or until a round drops nothing
    * (observed on the round's single checkpoint action). Degree counts
    * parallel stored directions separately — the same edge view every
    * loop here uses. The round budget is part of the CONTRACT, not a
    * heuristic: a bounded peel is deterministic whether or not it has
    * converged, which is what lets an unrolled SQL twin check it
    * exactly; at fixture diameters the fixpoint lands well inside the
    * default. Each round is two semi-joins (edge-endpoint survival) +
    * one count — all equi-joins on the packed key. Output: survivors
    * as `(label, _vid, degree)`, degree measured within the final
    * surviving subgraph. */
  def kCore(g: PropertyGraph, k: Int,
      edgeLabels: Set[String] = Set.empty, maxRounds: Int = 20): DataFrame = {
    require(k >= 1, s"kCore needs k >= 1, got $k")
    val edges = packedEdges(g, edgeLabels, undirected = true).localCheckpoint()
    var surv = packedVertices(g, incidentLabels(g, edgeLabels))
      .localCheckpoint()
    // one action per round: the observed checkpoint (the e29 lesson) —
    // the previous round's size rides in a driver var, never re-counted
    var size = surv.count()
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      val live = edges
        .join(surv.select(col("_v").as("_sv")), col("_s") === col("_sv"), "left_semi")
        .join(surv.select(col("_v").as("_dv")), col("_d") === col("_dv"), "left_semi")
      val deg = live.groupBy(col("_s")).agg(count(lit(1)).as("_deg"))
      val obs = new org.apache.spark.sql.Observation(s"kcore_r$round")
      val next = surv.join(deg, surv("_v") === deg("_s"), "left")
        .where(coalesce(col("_deg"), lit(0L)) >= k)
        .select(col("_v"))
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint()
      val after = obs.get("n").asInstanceOf[Long]
      done = after == size
      size = after
      surv = next
      round += 1
    }
    val live = edges
      .join(surv.select(col("_v").as("_sv")), col("_s") === col("_sv"), "left_semi")
      .join(surv.select(col("_v").as("_dv")), col("_d") === col("_dv"), "left_semi")
    val deg = live.groupBy(col("_s").as("_v")).agg(count(lit(1)).as("_deg"))
    surv.join(deg, Seq("_v"), "left")
      .select(
        unpackLabelStr(g, col("_v")).as("label"),
        unpackKey(col("_v")).as(GC.Id),
        coalesce(col("_deg"), lit(0L)).as("degree"))
  }

  /** Synchronous label propagation (TinkerPop `peerPressure()`, the
    * last GraphComputer step; Raghavan et al. 2007) made DETERMINISTIC:
    * each round every vertex adopts the most frequent label among its
    * undirected neighbors, ties to the SMALLEST label — GraphX's
    * [[GraphXBridge.labelPropagation]] breaks ties on hash-map
    * iteration order, which is why it can't sit under an oracle; this
    * form reruns identically under any partitioning. Each round is one
    * equi-join + one (vertex, label) count + one fan-in-sized
    * row_number window (partitioned by vertex — never a global sort).
    * Output: `(label, _vid, community_label, community_id)`. */
  def labelPropagation(g: PropertyGraph, iters: Int = 5,
      edgeLabels: Set[String] = Set.empty): DataFrame = {
    require(iters >= 1, s"labelPropagation needs iters >= 1, got $iters")
    val edges = packedEdges(g, edgeLabels, undirected = true).localCheckpoint()
    val touched = incidentLabels(g, edgeLabels)
    var labels = packedVertices(g, touched)
      .select(col("_v"), col("_v").as("_lbl")).localCheckpoint()
    for (_ <- 1 to iters) {
      val freq = edges.join(labels, edges("_d") === labels("_v"))
        .groupBy(col("_s"), col("_lbl")).agg(count(lit(1)).as("_n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_s")).orderBy(desc("_n"), asc("_lbl"))
      val best = freq.withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1)
        .select(col("_s").as("_bv"), col("_lbl").as("_nl"))
      labels = labels.join(best, labels("_v") === col("_bv"), "left")
        .select(labels("_v"), coalesce(col("_nl"), col("_lbl")).as("_lbl"))
        .localCheckpoint()
    }
    val untouched = g.vertexLabels.toSet -- touched
    if (untouched.nonEmpty)
      labels = labels.unionByName(
        packedVertices(g, untouched).select(col("_v"), col("_v").as("_lbl")))
    labels.select(
      unpackLabelStr(g, col("_v")).as("label"),
      unpackKey(col("_v")).as(GC.Id),
      unpackLabelStr(g, col("_lbl")).as("community_label"),
      unpackKey(col("_lbl")).as("community_id"))
  }

  /** Per-vertex triangle counts (undirected, parallel edges and
    * directions collapsed) — the DataFrame-native twin of
    * [[GraphXBridge.triangleCounts]]: edges canonicalized to `a < b`,
    * so each triangle `x < y < z` is found exactly once by one wedge
    * equi-join (`(x,y) ⋈ (y,z)`) closed by one semi-join against the
    * edge set, then each corner credited via a 3-way union + count.
    * Two shuffles on vertex keys + one aggregation, all
    * whole-stage-codegen; the wedge join's fan-out on high-degree
    * vertices is the known hot spot — AQE skew splitting covers it
    * here, and the degree-ordered orientation (each edge low→high
    * degree, bounding wedges by arboricity) is the documented 100-TB
    * variant of the same plan. Output: `(label, _vid, triangles)` —
    * vertices in no triangle report 0. */
  def triangleCounts(g: PropertyGraph,
      edgeLabels: Set[String] = Set.empty): DataFrame = {
    val raw = packedEdges(g, edgeLabels, undirected = false)
    val canon = raw.select(
      least(col("_s"), col("_d")).as("_a"),
      greatest(col("_s"), col("_d")).as("_b"))
      .where(col("_a") =!= col("_b")).distinct().localCheckpoint()
    val wedges = canon.as("e1")
      .join(canon.as("e2"), col("e1._b") === col("e2._a"))
      .select(col("e1._a").as("_x"), col("e1._b").as("_y"), col("e2._b").as("_z"))
    val tris = wedges.join(canon.as("e3"),
      col("_x") === col("e3._a") && col("_z") === col("e3._b"), "left_semi")
    val corners = tris.select(col("_x").as("_v"))
      .unionByName(tris.select(col("_y").as("_v")))
      .unionByName(tris.select(col("_z").as("_v")))
      .groupBy(col("_v")).agg(count(lit(1)).as("_n"))
    packedVertices(g, incidentLabels(g, edgeLabels))
      .join(corners, Seq("_v"), "left")
      .select(
        unpackLabelStr(g, col("_v")).as("label"),
        unpackKey(col("_v")).as(GC.Id),
        coalesce(col("_n"), lit(0L)).as("triangles"))
  }

  /** Fixed-iteration PageRank (damping 0.85, GraphX `staticPageRank`
    * semantics: ranks start at 1.0, dangling mass is not redistributed,
    * `rank' = 0.15 + 0.85 * Σ incoming rank/outDegree`) over the STORED
    * edge directions. Each iteration is one equi-join + one aggregation
    * on pre-degreed edges (degrees computed once, checkpointed); ranks
    * checkpoint per round so lineage stays linear. The per-iteration
    * shuffle is inherent to power iteration — Pregel pays it too; the
    * scale lever is partitioning both sides on the join key once.
    * Output: `(label, _vid, rank)`. */
  def pageRank(g: PropertyGraph, iters: Int = 20,
      edgeLabels: Set[String] = Set.empty): DataFrame = {
    require(iters >= 1, s"pageRank needs iters >= 1, got $iters")
    val edges = packedEdges(g, edgeLabels, undirected = false)
    val outDeg = edges.groupBy(col("_s")).agg(count(lit(1)).as("_deg"))
    val degreed = edges.join(outDeg, "_s").localCheckpoint()
    val touched = incidentLabels(g, edgeLabels)
    val verts = packedVertices(g, touched).localCheckpoint()
    var ranks = verts.withColumn("_r", lit(1.0))
    for (_ <- 1 to iters) {
      val contrib = degreed.join(ranks, degreed("_s") === ranks("_v"))
        .groupBy(col("_d")).agg(sum(col("_r") / col("_deg")).as("_in"))
      ranks = verts.join(contrib, verts("_v") === contrib("_d"), "left")
        .select(verts("_v"),
          (lit(0.15) + lit(0.85) * coalesce(col("_in"), lit(0.0))).as("_r"))
        .localCheckpoint()
    }
    val untouched = g.vertexLabels.toSet -- touched
    if (untouched.nonEmpty)
      // a vertex with no incident edges converges to the reset mass
      // after the first iteration — emit it directly, never joined
      ranks = ranks.unionByName(
        packedVertices(g, untouched).withColumn("_r", lit(0.15)))
    ranks.select(
      unpackLabelStr(g, col("_v")).as("label"),
      unpackKey(col("_v")).as(GC.Id),
      col("_r").as("rank"))
  }
}
