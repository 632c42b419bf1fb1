package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{Direction, EdgeSpec, GraphColumns => GC}

class GraphMutationsSpec extends SparkSpec {
  import spark.implicits._

  private def mkGraph: PropertyGraph = {
    val persons = Seq((1L, "alice"), (2L, "bob")).toDF(GC.Id, "name")
    val knows = Seq((1L, 2L, 5)).toDF(GC.Src, GC.Dst, "w")
    new PropertyGraph(spark, Map("Person" -> persons),
      Map(EdgeSpec("KNOWS", "Person", "Person") -> knows))
  }

  test("addVertices appends; missing prop columns become null") {
    val g2 = GraphMutations.addVertices(mkGraph, "Person",
      Seq(3L).toDF(GC.Id))
    assert(g2.vertices("Person").count() == 3)
    assert(g2.vertices("Person").where(col("name").isNull).count() == 1)
  }

  test("addEdges enforces (src,dst,label) uniqueness; existing edge wins") {
    val spec = EdgeSpec("KNOWS", "Person", "Person")
    val g2 = GraphMutations.addEdges(mkGraph, spec,
      Seq((1L, 2L, 99), (2L, 1L, 7)).toDF(GC.Src, GC.Dst, "w"))
    val rows = g2.edgeFrames(spec).as[(Long, Long, Int)].collect().toSet
    assert(rows == Set((1L, 2L, 5), (2L, 1L, 7))) // 1->2 keeps w=5
  }

  test("graph variables survive every mutation (derived graphs copy metadata)") {
    val g = mkGraph
    g.variables.set("schema_version", "7")
    g.variables.set("lineage", "spec")
    val spec = EdgeSpec("KNOWS", "Person", "Person")
    val mutated = Seq(
      GraphMutations.addVertices(g, "Person", Seq(3L).toDF(GC.Id)),
      GraphMutations.addEdges(g, spec, Seq((2L, 1L, 7)).toDF(GC.Src, GC.Dst, "w")),
      GraphMutations.removeVertices(g, "Person", Seq(2L)),
      GraphMutations.removeEdges(g, spec, Seq((1L, 2L))),
      GraphMutations.setVertexProperty(g, "Person", "name",
        Seq((1L, "alicia")).toDF(GC.Id, "value")))
    mutated.foreach { g2 =>
      assert(g2.variables.get("schema_version").contains("7"))
      assert(g2.variables.get("lineage").contains("spec"))
    }
  }

  test("edgesById composite lookup with misses absent") {
    val spec = EdgeSpec("KNOWS", "Person", "Person")
    val found = GraphMutations.edgesById(mkGraph, spec, Seq((1L, 2L), (9L, 9L)))
    assert(found.count() == 1)
  }

  test("edgeVertices returns endpoints per direction") {
    val spec = EdgeSpec("KNOWS", "Person", "Person")
    val e = mkGraph.edgeFrames(spec)
    val outV = GraphMutations.edgeVertices(mkGraph, spec, e, Direction.Out)
    assert(outV.select("name").as[String].collect().toSeq == Seq("alice"))
    val bothV = GraphMutations.edgeVertices(mkGraph, spec, e, Direction.Both)
    assert(bothV.select("name").as[String].collect().toSet == Set("alice", "bob"))
  }

  test("setVertexProperty single overwrites, list appends, set dedups") {
    val g = mkGraph
    val upd = Seq((1L, "alicia")).toDF(GC.Id, "value")
    val g2 = GraphMutations.setVertexProperty(g, "Person", "name", upd)
    assert(g2.vertices("Person").where(col(GC.Id) === 1).select("name")
      .as[String].head() == "alicia")
    assert(g2.vertices("Person").where(col(GC.Id) === 2).select("name")
      .as[String].head() == "bob")

    val tags = Seq((1L, "x")).toDF(GC.Id, "value")
    val g3 = GraphMutations.setVertexProperty(g2, "Person", "tags", tags, "list")
    val g4 = GraphMutations.setVertexProperty(g3, "Person", "tags", tags, "list")
    assert(g4.vertices("Person").where(col(GC.Id) === 1).select("tags")
      .as[Seq[String]].head() == Seq("x", "x"))

    // set cardinality: array_union dedups, ["x","x"] union ["x"] = ["x"]
    val g5 = GraphMutations.setVertexProperty(g4, "Person", "tags", tags, "set")
    assert(g5.vertices("Person").where(col(GC.Id) === 1).select("tags")
      .as[Seq[String]].head() == Seq("x"))
  }

  test("vertexProperties point read with single-key projection") {
    val props = GraphMutations.vertexProperties(mkGraph, "Person", 1L, Seq("name"))
    assert(props == Map("name" -> "alice"))
    assert(GraphMutations.vertexProperties(mkGraph, "Person", 99L).isEmpty)
  }

  test("removeVertices cascades to incident edges on both endpoints") {
    val spec = EdgeSpec("KNOWS", "Person", "Person")
    val g = GraphMutations.addEdges(mkGraph, spec, Seq((2L, 1L, 7)).toDF(GC.Src, GC.Dst, "w"))
    // removing bob removes bob AND both edges (src match and dst match)
    val g2 = GraphMutations.removeVertices(g, "Person", Seq(2L))
    assert(g2.vertices("Person").select(GC.Id).as[Long].collect().toSeq == Seq(1L))
    assert(g2.edgeFrames(spec).count() == 0)
    // removing a non-endpoint vertex leaves edges alone
    val g3 = GraphMutations.addVertices(g, "Person", Seq((3L, "carol")).toDF(GC.Id, "name"))
    val g4 = GraphMutations.removeVertices(g3, "Person", Seq(3L))
    assert(g4.edgeFrames(spec).count() == 2)
  }

  test("removeEdges drops composite ids, leaves vertices") {
    val spec = EdgeSpec("KNOWS", "Person", "Person")
    val g = GraphMutations.addEdges(mkGraph, spec, Seq((2L, 1L, 7)).toDF(GC.Src, GC.Dst, "w"))
    val g2 = GraphMutations.removeEdges(g, spec, Seq((1L, 2L)))
    assert(g2.edgeFrames(spec).select(GC.Src, GC.Dst).as[(Long, Long)]
      .collect().toSeq == Seq((2L, 1L)))
    assert(g2.vertices("Person").count() == 2)
  }
}
