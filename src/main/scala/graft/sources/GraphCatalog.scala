package graft.sources

import graft.graph.PropertyGraph

/** The `spark.sql` surface: register a [[PropertyGraph]] as temp views —
  * one `v_<label>` per vertex label, one `e_<label>_<src>_<dst>` per
  * adjacency partition, plus the unified `graft_vertices` /
  * `graft_edges` generic views — so the whole graph is queryable from
  * SQL text alongside the DataFrame/DSL APIs. Views are lazy plan
  * aliases: no data movement, and Catalyst prunes/pushes through them
  * exactly as through the frames themselves. */
object GraphCatalog {

  def registerViews(g: PropertyGraph, prefix: String = ""): Unit = {
    g.vertexLabels.foreach { l =>
      g.vertices(l).createOrReplaceTempView(s"${prefix}v_${l.toLowerCase}")
    }
    g.edgeSpecs.foreach { s =>
      g.edgeFrames(s).createOrReplaceTempView(
        s"${prefix}e_${s.label.toLowerCase}_${s.srcLabel.toLowerCase}_${s.dstLabel.toLowerCase}")
    }
    g.unifiedVertices.createOrReplaceTempView(s"${prefix}graft_vertices")
    g.unifiedEdges.createOrReplaceTempView(s"${prefix}graft_edges")
  }
}
