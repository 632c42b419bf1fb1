package graft.graph

import graft.SparkSpec
import graft.sources.GraphLoader

class GraphVariablesSpec extends SparkSpec {

  test("set/get/keys/remove behave like the Graph.Variables contract") {
    val v = new GraphVariables
    assert(v.keys.isEmpty && v.get("x").isEmpty)
    v.set("schema_version", "4")
    v.set("loaded_from", "/data/tpch")
    assert(v.keys == Set("schema_version", "loaded_from"))
    assert(v.get("schema_version").contains("4"))
    v.set("schema_version", "5") // overwrite
    assert(v.get("schema_version").contains("5"))
    v.remove("loaded_from")
    assert(v.keys == Set("schema_version"))
    assertThrows[IllegalArgumentException](v.set("", "x"))
    assertThrows[IllegalArgumentException](v.set("k", null))
  }

  test("variables round-trip through persist + open, including tricky characters") {
    val g = GraphLoader.tpch(spark, sf0001)
    g.variables.set("note", "line1\nline2\twith tab and back\\slash")
    g.variables.set("loaded_at", "2026-08-12T00:00:00Z")
    val dir = java.nio.file.Files.createTempDirectory("graft_vars").toString
    GraphLoader.persist(g, dir)
    val reopened = GraphLoader.open(spark, dir)
    assert(reopened.variables.toMap == g.variables.toMap)
    // an un-annotated graph round-trips to empty variables
    val g2 = GraphLoader.tpch(spark, sf0001)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_vars2").toString
    GraphLoader.persist(g2, dir2)
    assert(GraphLoader.open(spark, dir2).variables.keys.isEmpty)
  }

  test("variables also round-trip through the CSV persistence path") {
    val g = GraphLoader.tpch(spark, sf0001)
    g.variables.set("source", "csv-test")
    val dir = java.nio.file.Files.createTempDirectory("graft_vars_csv").toString
    GraphLoader.persistCsv(g, dir)
    assert(GraphLoader.openCsv(spark, dir).variables.get("source").contains("csv-test"))
  }
}
