package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.graph.PropertyGraph
import graft.model.{Direction, EdgeSpec, GraphColumns => GC}

/** Traversal-algebra invariants on a tiny in-memory graph
  * (SURVEY.md §7.4 risk 1: fuse multiplicity, intersect/subtract
  * dropping value+prop entries in lockstep, BOTH-direction union).
  *
  * Graph: persons 1,2,3; cities 10,20.
  *   KNOWS (Person->Person): 1->2, 1->3, 2->3, 3->2  (w: 12,13,23,32)
  *   LIVES_IN (Person->City): 1->10, 2->10, 3->20
  */
class TraversalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val g: PropertyGraph = {
    val persons = Seq(1L, 2L, 3L).toDF(GC.Id).withColumn("name", concat(lit("p"), col(GC.Id)))
    val cities = Seq(10L, 20L).toDF(GC.Id)
    val knows = Seq((1L, 2L, 12), (1L, 3L, 13), (2L, 3L, 23), (3L, 2L, 32))
      .toDF(GC.Src, GC.Dst, "w")
    val lives = Seq((1L, 10L), (2L, 10L), (3L, 20L)).toDF(GC.Src, GC.Dst)
    new PropertyGraph(spark,
      Map("Person" -> persons, "City" -> cities),
      Map(EdgeSpec("KNOWS", "Person", "Person") -> knows,
        EdgeSpec("LIVES_IN", "Person", "City") -> lives))
  }

  private def pairs(r: TraversalResult): Set[(Long, Long)] =
    r.df.select(GC.Src, GC.Dst).as[(Long, Long)].collect().toSet

  test("traverse OUT / IN / BOTH") {
    val f1 = g.verticesById("Person", Seq(1L))
    val out = g.traverse(f1, "Person", "KNOWS", Direction.Out)
    assert(pairs(out) == Set((1L, 2L), (1L, 3L)))

    val in2 = g.traverse(g.verticesById("Person", Seq(2L)), "Person", "KNOWS", Direction.In)
    assert(pairs(in2) == Set((2L, 1L), (2L, 3L)))

    // BOTH = OUT union IN, each stored direction once (no dedup):
    // vertex 2: OUT 2->3; IN from 1 and 3 -> three rows
    val both2 = g.traverse(g.verticesById("Person", Seq(2L)), "Person", "KNOWS", Direction.Both)
    assert(both2.df.count() == 3)
    assert(pairs(both2) == Set((2L, 3L), (2L, 1L)))
  }

  test("fillEdge carries edge properties; removeEdgeIf filters in lockstep") {
    val r = g.traverse(g.frontier("Person"), "Person", "KNOWS", Direction.Out, fillEdge = true)
    assert(r.edgePropCols == Seq("w"))
    val kept = r.removeEdgeIf(col("w") >= 23)
    assert(kept.df.select(GC.Src, GC.Dst, "w").as[(Long, Long, Int)].collect().toSet ==
      Set((1L, 2L, 12), (1L, 3L, 13)))
  }

  test("fuse composes hops; dedup=false preserves path multiplicity") {
    val hop1 = g.traverse(g.verticesById("Person", Seq(1L)), "Person", "KNOWS", Direction.Out)
    val hop2 = g.traverse(hop1.vSetIds, "Person", "KNOWS", Direction.Out)
    // paths from 1: 1->2->3, 1->3->2 — and with multiplicity via both mids
    val noDedup = hop1.fuse(hop2, dedup = false)
    assert(noDedup.df.count() == 2)
    val deduped = hop1.fuse(hop2, dedup = true)
    assert(pairs(deduped) == Set((1L, 3L), (1L, 2L)))

    // two-path multiplicity: 2 and 3 both know... extend: from {1}, two
    // 2-hop paths end at distinct targets here; check a diamond:
    val hopA = g.traverse(g.frontier("Person"), "Person", "KNOWS", Direction.Out)
    val hopB = g.traverse(hopA.vSetIds, "Person", "LIVES_IN", Direction.Out)
    val fanned = hopA.fuse(hopB, dedup = false)
    // 1->2->10, 1->3->20, 2->3->20, 3->2->10: 4 paths
    assert(fanned.df.count() == 4)
  }

  test("intersect keeps only pairs with neighbor in set; subtract removes them") {
    val r = g.traverse(g.frontier("Person"), "Person", "LIVES_IN", Direction.Out, fillEdge = false)
    val city10 = Seq(10L).toDF(GC.Id)
    assert(pairs(r.intersect(city10)) == Set((1L, 10L), (2L, 10L)))
    assert(pairs(r.subtract(city10)) == Set((3L, 20L)))
  }

  test("vSet dedups; keylist projects sources; degrees counts per source") {
    val r = g.traverse(g.frontier("Person"), "Person", "LIVES_IN", Direction.Out)
    assert(r.vSet.select(GC.Id).as[Long].collect().toSet == Set(10L, 20L))
    assert(r.keylist.select(GC.Id).as[Long].collect().toSet == Set(1L, 2L, 3L))
    val deg = r.degrees.as[(Long, Long)].collect().toMap
    assert(deg == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("hydrate attaches vertex properties") {
    val r = g.traverse(g.verticesById("Person", Seq(2L, 3L)), "Person", "KNOWS", Direction.Out)
    val h = g.hydrate(r.df, GC.Dst, "Person", Seq("name"))
    assert(h.select("name").as[String].collect().toSet == Set("p2", "p3"))
  }

  test("unified views carry 128-bit ids and string props") {
    val uv = g.unifiedVertices
    assert(uv.columns.toSeq == Seq("id", "label", "props"))
    assert(uv.count() == 5)
    val ue = g.unifiedEdges
    assert(ue.count() == 7)
    // label-space (hi) separates Person and City id spaces
    val his = uv.select($"id.hi").as[Long].collect().toSet
    assert(his.size == 2)
  }
}
