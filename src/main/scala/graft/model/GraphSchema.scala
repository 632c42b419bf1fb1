package graft.model

/** Direction of traversal relative to the frontier vertex set.
  * Reference semantics: TinkerPop `Direction` as used by
  * `TorcGraph.traverse` / `vertexNeighbors`
  * (TorcGraph.java:479-585, 833-939). `Both` is the union of the OUT and
  * IN expansions — each bidirectionally-stored edge contributes once per
  * direction (TorcGraph.java:861-875), so Both is a plain `union`, not a
  * distinct union (SURVEY.md §7.4 risk 3).
  */
sealed trait Direction
object Direction {
  case object Out extends Direction
  case object In extends Direction
  case object Both extends Direction
}

/** Identity of one adjacency partition: the reference partitions adjacency
  * by (edgeLabel, direction, neighborVertexLabel) as the unit of traversal
  * I/O (TorcHelper.java:352-370). We preserve that logically: one
  * DataFrame per (edge label, source label, destination label), which is
  * partition pruning by construction — a traversal only ever unions the
  * frames it names (SURVEY.md §1.3).
  */
final case class EdgeSpec(label: String, srcLabel: String, dstLabel: String)

/** Canonical column names used inside traversal DataFrames. */
object GraphColumns {
  val Id = "_vid"           // vertex id (natural long key within a label)
  val Label = "_vlabel"     // vertex label
  val Src = "_src"          // edge source vertex id
  val Dst = "_dst"          // edge destination vertex id
  val SrcLabel = "_src_label"
  val DstLabel = "_dst_label"
  val EdgeLabel = "_elabel"
}
