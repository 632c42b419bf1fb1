package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{EdgeSpec, GraphColumns => GC}

/** The capability matrix must DESCRIBE the engine, not just mirror the
  * reference's text — each behavioral flag is asserted against the
  * mutation semantics it claims (round-10 verdict task 6: "addEdges
  * existing-wins ⇔ the uniqueness flag"). */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  private val f = Features.matrix

  private def mkGraph: PropertyGraph = {
    val persons = Seq((1L, "alice"), (2L, "bob")).toDF(GC.Id, "name")
    val knows = Seq((1L, 2L, 5)).toDF(GC.Src, GC.Dst, "w")
    new PropertyGraph(spark, Map("Person" -> persons),
      Map(EdgeSpec("KNOWS", "Person", "Person") -> knows))
  }

  test("matrix mirrors the reference where the engines agree") {
    // TorcGraph.java:1819-1878 — shared flags
    assert(!f.graph.supportsComputer)
    assert(f.graph.supportsPersistence)
    assert(!f.graph.supportsConcurrentAccess)
    assert(!f.vertex.supportsMetaProperties)
    assert(f.vertex.defaultCardinality == "single")
    // deliberate divergences (documented in Features' scaladoc)
    assert(!f.graph.supportsTransactions) // SURVEY §7.0 non-goal
    assert(f.edge.supportsRemoveEdges) // O34 cascade exists here
    assert(f.vertexPropertyValues.supportsDoubleValues) // beyond string-ish
  }

  test("uniqueEdgePerVertexPairAndLabel ⇔ addEdges existing-wins") {
    assert(f.edge.uniqueEdgePerVertexPairAndLabel)
    assert(f.edge.existingEdgeWinsOnConflict)
    val spec = EdgeSpec("KNOWS", "Person", "Person")
    val g2 = GraphMutations.addEdges(mkGraph, spec,
      Seq((1L, 2L, 99)).toDF(GC.Src, GC.Dst, "w"))
    val rows = g2.edgeFrames(spec).as[(Long, Long, Int)].collect().toSet
    assert(rows == Set((1L, 2L, 5))) // one edge, the EXISTING one
  }

  test("supportsAddVertices/UserSuppliedIds ⇔ addVertices with explicit ids") {
    assert(f.vertex.supportsAddVertices && f.vertex.supportsUserSuppliedIds
      && f.vertex.supportsNumericIds)
    val g2 = GraphMutations.addVertices(mkGraph, "Person", Seq(42L).toDF(GC.Id))
    assert(g2.vertices("Person").where(col(GC.Id) === 42L).count() == 1)
  }

  test("supportsRemoveVertices ⇔ cascade removal works") {
    assert(f.vertex.supportsRemoveVertices)
    val g2 = GraphMutations.removeVertices(mkGraph, "Person", Seq(2L))
    assert(g2.vertices("Person").count() == 1)
    assert(g2.edgeFrames(EdgeSpec("KNOWS", "Person", "Person")).count() == 0)
  }

  test("supportsMultiProperties ⇔ list-cardinality setVertexProperty") {
    assert(f.vertex.supportsMultiProperties)
    val tags = Seq((1L, "x")).toDF(GC.Id, "value")
    val g2 = GraphMutations.setVertexProperty(
      GraphMutations.setVertexProperty(mkGraph, "Person", "tags", tags, "list"),
      "Person", "tags", tags, "list")
    // list cardinality appends (2 entries), which single could not hold
    assert(g2.vertices("Person").where(col(GC.Id) === 1L)
      .select(size(col("tags"))).head().getInt(0) == 2)
  }

  test("supportsTransactions=false ⇔ no tx surface exists") {
    assert(!f.graph.supportsTransactions && !f.graph.supportsThreadedTransactions)
    // the graph type genuinely exposes no commit/rollback member
    val methods = classOf[PropertyGraph].getMethods.map(_.getName).toSet
    assert(!methods.contains("commit") && !methods.contains("rollback")
      && !methods.contains("tx"))
  }

  test("supportsVariables ⇔ the variables surface round-trips") {
    assert(f.graph.supportsVariables)
    val g = mkGraph
    g.variables.set("k", "v")
    assert(g.variables.toMap == Map("k" -> "v"))
  }
}
