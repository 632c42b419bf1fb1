package graft.analytics

import graft.SparkSpec
import graft.sources.GraphLoader

class GraphXBridgeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val g = GraphLoader.tpch(spark, sf0001)

  test("id packing round-trips") {
    val vid = GraphXBridge.pack(3L, 123456789L)
    assert(GraphXBridge.unpackLabel(vid) == 3L)
    assert(GraphXBridge.unpackKey(vid) == 123456789L)
  }

  test("toGraphX carries every vertex and edge") {
    val gx = GraphXBridge.toGraphX(g)
    val vTotal = g.vertexLabels.map(g.vertices(_).count()).sum
    val eTotal = g.edgeSpecs.map(g.edgeFrames(_).count()).sum
    assert(gx.vertices.count() == vTotal)
    assert(gx.edges.count() == eTotal)
  }

  test("triangleCounts finds the one triangle in a hand-built graph") {
    import graft.graph.PropertyGraph
    import graft.model.EdgeSpec
    // 1-2-3 form a triangle; 4 hangs off it (0 triangles)
    val tri = new PropertyGraph(spark,
      Map("U" -> Seq(1L, 2L, 3L, 4L).toDF("_vid")),
      Map(EdgeSpec("K", "U", "U") ->
        Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("_src", "_dst")))
    val counts = GraphXBridge.triangleCounts(tri)
      .select("_vid", "triangles").as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
    // the bipartite-ish TPC-H projection has no triangles at all
    assert(GraphXBridge.triangleCounts(g)
      .agg(org.apache.spark.sql.functions.sum("triangles"))
      .head().getLong(0) == 0L)
  }

  test("labelPropagation groups a two-clique barbell into communities") {
    import graft.graph.PropertyGraph
    import graft.model.EdgeSpec
    // two 4-cliques joined by one bridge edge
    def clique(ids: Seq[Long]) = for { a <- ids; b <- ids if a < b } yield (a, b)
    val left = Seq(1L, 2L, 3L, 4L)
    val right = Seq(10L, 11L, 12L, 13L)
    val barbell = new PropertyGraph(spark,
      Map("U" -> (left ++ right).toDF("_vid")),
      Map(EdgeSpec("K", "U", "U") ->
        (clique(left) ++ clique(right) :+ (4L, 10L)).toDF("_src", "_dst")))
    val comm = GraphXBridge.labelPropagation(barbell, iters = 10)
      .select("_vid", "community").as[(Long, Long)].collect().toMap
    // every vertex labeled; intra-clique agreement is the structural
    // expectation (label propagation is tie-noisy, so assert weakly:
    // each clique's members land in at most 2 distinct communities)
    assert(comm.keySet == (left ++ right).toSet)
    assert(left.map(comm).distinct.size <= 2)
    assert(right.map(comm).distinct.size <= 2)
  }

  test("connected components: the TPC-H graph is one component") {
    // region<-nation<-customer<-order->part/supplier chains connect
    // everything through shared parts/suppliers at this scale
    val cc = GraphXBridge.connectedComponents(g)
    assert(cc.select("component").distinct().count() == 1)
  }

  test("dense relabeling runs CC on keys beyond 48 bits") {
    import graft.graph.PropertyGraph
    import graft.model.EdgeSpec
    val big = (1L << 52) + 7 // pack() would throw on this key
    intercept[IllegalArgumentException] { GraphXBridge.pack(1L, big) }
    val users = Seq(1L, 2L, big).toDF("_vid")
    val edges = Seq((1L, 2L)).toDF("_src", "_dst")
    val pg = new PropertyGraph(spark,
      Map("User" -> users),
      Map(EdgeSpec("KNOWS", "User", "User") -> edges))
    val cc = GraphXBridge.connectedComponentsDense(pg)
      .select("_vid", "comp_vid").as[(Long, Long)].collect().toMap
    assert(cc(1L) == 1L && cc(2L) == 1L) // 1-2 connected, rep = min key
    assert(cc(big) == big)               // the huge key is its own component
  }

  test("dense CC agrees with the packed path on the TPC-H graph") {
    val dense = GraphXBridge.connectedComponentsDense(g)
    assert(dense.select("comp_label_id", "comp_vid").distinct().count() == 1)
    assert(dense.count() == g.vertexLabels.map(g.vertices(_).count()).sum)
  }

  test("pageRank ranks nations above their customers (in-degree mass)") {
    val pr = GraphXBridge.pageRank(g)
    val byLabel = pr.groupBy("label_id")
      .avg("rank").as[(Long, Double)].collect().toMap
    val nationId = g.labelIds("Nation")
    val customerId = g.labelIds("Customer")
    assert(byLabel(nationId) > byLabel(customerId))
  }
}
