package graft.sources

import graft.SparkSpec

class CsvRoundTripSpec extends SparkSpec {

  test("CSV persist + reopen is lossless (schema sidecar)") {
    val g = GraphLoader.tpch(spark, sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    GraphLoader.persistCsv(g, tmp)
    val back = GraphLoader.openCsv(spark, tmp)

    assert(back.vertexLabels == g.vertexLabels)
    assert(back.edgeSpecs == g.edgeSpecs)
    g.vertexLabels.foreach { l =>
      assert(back.vertices(l).schema == g.vertices(l).schema, s"schema $l")
      assert(back.vertices(l).count() == g.vertices(l).count(), s"count $l")
    }
    val spec = g.edgeSpecs.find(_.label == "CONTAINS").get
    val a = g.edgeFrames(spec)
    val b = back.edgeFrames(spec)
    assert(b.schema == a.schema)
    assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty)
  }
}
