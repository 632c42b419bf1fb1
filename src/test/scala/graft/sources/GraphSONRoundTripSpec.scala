package graft.sources

import graft.SparkSpec
import graft.model.{GraphColumns => GC}
import org.apache.spark.sql.functions._

/** GraphSON persist + reopen — the Graph.io() interchange parity hole
  * VERDICT round-9 names (item 7): the round trip must restore every
  * vertex frame, every edge spec (including a label fanning out to two
  * destination labels), property VALUES (typed envelopes incl. the
  * gx:LocalDateTime micros form), and the variables sidecar. */
class GraphSONRoundTripSpec extends SparkSpec {

  test("GraphSON persist + reopen is lossless on the tpch fixture") {
    val g = GraphLoader.tpch(spark, sf0001)
    g.variables.set("creator", "graft")
    g.variables.set("note", "tab\there")
    val tmp = java.nio.file.Files.createTempDirectory("graft_gson").toString
    GraphSON.persistGraphSON(g, tmp)
    val back = GraphSON.openGraphSON(spark, tmp)

    assert(back.vertexLabels == g.vertexLabels)
    assert(back.edgeSpecs == g.edgeSpecs)
    // vertex VALUES round-trip per label (column order normalized:
    // GraphSON properties are name-sorted by construction)
    g.vertexLabels.foreach { l =>
      val cols = g.vertices(l).columns.sorted.map(col(_))
      val a = g.vertices(l).select(cols.toSeq: _*)
      val b = back.vertices(l).select(cols.toSeq: _*)
      assert(b.schema == a.schema, s"schema $l:\n${b.schema}\nvs\n${a.schema}")
      assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty, s"values $l")
    }
    // edge VALUES round-trip, including the timestamped CONTAINS props
    g.edgeSpecs.foreach { s =>
      val cols = g.edgeFrames(s).columns.sorted.map(col(_))
      val a = g.edgeFrames(s).select(cols.toSeq: _*)
      val b = back.edgeFrames(s).select(cols.toSeq: _*)
      assert(b.schema == a.schema, s"schema $s:\n${b.schema}\nvs\n${a.schema}")
      assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty, s"values $s")
    }
    assert(back.variables.toMap == g.variables.toMap)
  }

  test("GraphSON round-trip splits a fanned-out edge label back into its specs") {
    // snb's REPLY_OF goes Comment->Post AND Comment->Comment — the case
    // where outE's label alone cannot name the spec and the reader must
    // recover the destination label from the packed id space
    val g = GraphLoader.snb(spark, sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("graft_gson_snb").toString
    GraphSON.persistGraphSON(g, tmp)
    val back = GraphSON.openGraphSON(spark, tmp)
    assert(back.edgeSpecs == g.edgeSpecs)
    g.edgeSpecs.filter(_.label == "REPLY_OF").foreach { s =>
      val a = g.edgeFrames(s).select(col(GC.Src), col(GC.Dst))
      val b = back.edgeFrames(s).select(col(GC.Src), col(GC.Dst))
      assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty, s"values $s")
      assert(b.count() == a.count() && a.count() > 0, s"count $s")
    }
  }

  test("GraphSON lines are valid spec-shaped JSON with typed envelopes") {
    val g = GraphLoader.tpch(spark, sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("graft_gson_shape").toString
    GraphSON.persistGraphSON(g, tmp)
    val lines = spark.read.text(s"$tmp/graphson")
    // every line parses and carries id/label
    assert(lines.where(get_json_object(col("value"), "$.id.@value").isNull ||
      get_json_object(col("value"), "$.label").isNull).isEmpty)
    // a Customer line: packed id, g:Int64 envelope, g:Double acctbal
    val c = lines.where(get_json_object(col("value"), "$.label") === "Customer")
      .select(
        get_json_object(col("value"), "$.id.@type").as("t"),
        get_json_object(col("value"), "$.properties.c_acctbal[0].value.@type").as("bt"),
        get_json_object(col("value"), "$.outE.IN_NATION[0].inV.@type").as("et"))
      .head()
    assert(c.getString(0) == "g:Int64")
    assert(c.getString(1) == "g:Double")
    assert(c.getString(2) == "g:Int64")
    // an Order line: CONTAINS adjacency with the timestamp-NTZ ship date
    val o = lines.where(get_json_object(col("value"), "$.label") === "Order" &&
        get_json_object(col("value"), "$.outE.CONTAINS[0].inV.@value").isNotNull)
      .select(get_json_object(col("value"),
        "$.outE.CONTAINS[0].properties.l_shipdate.@type").as("st"))
      .head()
    assert(o.getString(0) == "gx:LocalDateTime")
  }

  test("GraphSON round-trip keeps empty labels, empty specs, all-null columns") {
    // The advisor's round-10 scenario: a zero-row vertex label emits no
    // lines, so an observation-based reader would shift every
    // higher-sorted label's re-derived id and drop the empty spec and
    // the all-null column entirely. The manifest makes these lossless.
    import spark.implicits._
    import graft.model.EdgeSpec
    val people = Seq((1L, "ann", null.asInstanceOf[java.lang.Double]),
      (2L, "bob", null.asInstanceOf[java.lang.Double]))
      .toDF(GC.Id, "name", "score") // score: ALL null
    val zombies = people.where(lit(false)) // zero-row label, sorts LAST
    val follows = Seq((1L, 2L, 7L)).toDF(GC.Src, GC.Dst, "weight")
    val haunts = follows.where(lit(false)).toDF(GC.Src, GC.Dst, "weight")
    val g = new graft.graph.PropertyGraph(spark,
      Map("Person" -> people, "Zombie" -> zombies),
      Map(EdgeSpec("FOLLOWS", "Person", "Person") -> follows,
        EdgeSpec("HAUNTS", "Zombie", "Person") -> haunts))
    val tmp = java.nio.file.Files.createTempDirectory("graft_gson_empty").toString
    GraphSON.persistGraphSON(g, tmp)
    val back = GraphSON.openGraphSON(spark, tmp)
    assert(back.vertexLabels == Seq("Person", "Zombie"))
    assert(back.edgeSpecs == g.edgeSpecs)
    assert(back.labelIds == g.labelIds) // ids must NOT shift
    assert(back.vertices("Zombie").count() == 0)
    // name/type equality (nullability differs by construction: decode
    // arithmetic is nullable, the local test fixture's ids are not)
    assert(back.vertices("Zombie").schema.map(f => (f.name, f.dataType)) ==
      g.vertices("Zombie").schema.map(f => (f.name, f.dataType)))
    assert(back.edgeFrames(EdgeSpec("HAUNTS", "Zombie", "Person")).count() == 0)
    val p = back.vertices("Person").orderBy(GC.Id)
    assert(p.schema("score").dataType == org.apache.spark.sql.types.DoubleType)
    assert(p.select("score").collect().forall(_.isNullAt(0)))
    assert(p.select("name").as[String].collect().toSeq == Seq("ann", "bob"))
    val f = back.edgeFrames(EdgeSpec("FOLLOWS", "Person", "Person")).head()
    assert((f.getLong(0), f.getLong(1), f.getLong(2)) == ((1L, 2L, 7L)))
  }

  test("gx:Instant text is true UTC under a non-UTC session timezone") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ts = java.sql.Timestamp.from(
        java.time.Instant.parse("2024-06-01T12:00:00Z"))
      val g = new graft.graph.PropertyGraph(spark,
        Map("Event" -> Seq((1L, ts)).toDF(GC.Id, "at")),
        Map.empty)
      val tmp = java.nio.file.Files.createTempDirectory("graft_gson_tz").toString
      GraphSON.persistGraphSON(g, tmp)
      // the interchange TEXT must carry the UTC instant, not NY wall clock
      val txt = spark.read.text(s"$tmp/graphson")
        .select(get_json_object(col("value"),
          "$.properties.at[0].value.@value")).as[String].head()
      assert(txt == "2024-06-01T12:00:00.000000Z", txt)
      // and the round trip restores the same micros under the same TZ
      val back = GraphSON.openGraphSON(spark, tmp)
      val got = back.vertices("Event").select("at")
        .as[java.sql.Timestamp].head()
      assert(got.toInstant == ts.toInstant)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
