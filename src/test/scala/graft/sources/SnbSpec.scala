package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.EdgeSpec

/** Invariants of the generated SNB fixture ([[GraphLoader.snb]]) and a
  * cross-engine consistency law: the GraphX Pregel BFS (q26's path) and
  * the DSL's driver-superstep `untilFixpoint` are independent iterative
  * engines and must visit exactly the same vertex set. */
class SnbSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sg = GraphLoader.snb(spark, sf0001)

  test("knows generator: no self loops, deduped, supernode skew, since formula") {
    val knows = sg.edgeFrames(EdgeSpec("KNOWS", "Person", "Person"))
    val rows = knows.select(col("_src"), col("_dst"), col("since"))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (s, d, _) => s != d }, "self loop leaked")
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length, "duplicate (src, dst)")
    assert(rows.forall { case (s, d, p) => p == (7 * s + 3 * d) % 1000 }, "since formula drift")
    val outDeg = rows.groupBy(_._1).view.mapValues(_.length)
    // supernodes (p % 97 == 0) emit 40 edges minus dropped self/dups;
    // everyone else tops out at 5
    assert(outDeg.values.max >= 35, s"no supernode: max degree ${outDeg.values.max}")
    assert(outDeg.filter { case (p, _) => p % 97 != 0 }.values.max <= 5)
  }

  test("Pregel BFS (q26) == DSL untilFixpoint visited set on the knows graph") {
    val viaPregel = graft.queries.Inventory.q26_snb_path(spark, sf0001)
      .select(col("person_id")).as[Long].collect().toSet
    val viaDsl = graft.dsl.G(sg).V("Person", 1L)
      .untilFixpoint(maxIter = 4)(_.both("KNOWS"))
      .toDF.select(col(graft.model.GraphColumns.Id)).as[Long].collect().toSet
    assert(viaPregel == viaDsl,
      s"engines disagree: pregel-only=${(viaPregel -- viaDsl).take(5)}, dsl-only=${(viaDsl -- viaPregel).take(5)}")
    assert(viaPregel.contains(1L) && viaPregel.size > 1)
  }
}
