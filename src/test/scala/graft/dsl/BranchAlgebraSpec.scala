package graft.dsl

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.graph.PropertyGraph
import graft.model.{EdgeSpec, GraphColumns => GC}

/** Branch-step laws on seeded random graphs vs a brute-force frontier
  * model — the TraversalAlgebraSpec discipline applied to the Gremlin
  * union/optional/coalesce/as/select surface. A frontier is a MULTISET
  * of (id, label); branches are modeled as per-origin expansions. */
class BranchAlgebraSpec extends SparkSpec {
  import spark.implicits._

  private val seeds = Seq(7, 23, 61)

  private case class Model(
      as: Seq[Long], bs: Seq[Long],
      eAA: Seq[(Long, Long)], eAB: Seq[(Long, Long)], fBA: Seq[(Long, Long)]) {
    /** out("E") from an A vertex: both E specs fan out. */
    def outE(a: Long): Seq[(Long, String)] =
      eAA.collect { case (s, d) if s == a => (d, "A") } ++
        eAB.collect { case (s, d) if s == a => (d, "B") }
    /** in("F") at an A vertex: F edges arriving from B. */
    def inF(a: Long): Seq[(Long, String)] =
      fBA.collect { case (s, d) if d == a => (s, "B") }
  }

  private def randomModel(seed: Int): Model = {
    val rnd = new Random(seed)
    val as = (0L until (4 + rnd.nextInt(5))).toSeq
    val bs = (100L until (100L + 3 + rnd.nextInt(5))).toSeq
    def edges(src: Seq[Long], dst: Seq[Long], n: Int) =
      Seq.fill(n)((src(rnd.nextInt(src.size)), dst(rnd.nextInt(dst.size)))).distinct
    Model(as, bs,
      edges(as, as, 6 + rnd.nextInt(6)),
      edges(as, bs, 6 + rnd.nextInt(6)),
      edges(bs, as, 6 + rnd.nextInt(6)))
  }

  private def toGraph(m: Model): PropertyGraph =
    new PropertyGraph(spark,
      Map("A" -> m.as.toDF(GC.Id), "B" -> m.bs.toDF(GC.Id)),
      Map(
        EdgeSpec("E", "A", "A") -> m.eAA.toDF(GC.Src, GC.Dst),
        EdgeSpec("E", "A", "B") -> m.eAB.toDF(GC.Src, GC.Dst),
        EdgeSpec("F", "B", "A") -> m.fBA.toDF(GC.Src, GC.Dst)))

  private def bag(s: Step): Seq[(Long, String)] =
    s.toDF.select(col(GC.Id), col(GC.Label)).as[(Long, String)].collect().toSeq.sorted

  test("union(b1, b2) = b1 output ++ b2 output (multiset, 3 seeds)") {
    seeds.foreach { seed =>
      val m = randomModel(seed)
      val g = G(toGraph(m))
      val got = bag(g.V("A").union(_.out("E"), _.in("F")))
      val want = (m.as.flatMap(m.outE) ++ m.as.flatMap(m.inF)).sorted
      assert(got == want, s"seed $seed")
    }
  }

  test("optional(b) = b output ++ inputs b does not cover (3 seeds)") {
    seeds.foreach { seed =>
      val m = randomModel(seed)
      val g = G(toGraph(m))
      val got = bag(g.V("A").optional(_.out("E")))
      val covered = m.as.filter(a => m.outE(a).nonEmpty).toSet
      val want = (m.as.flatMap(m.outE) ++
        m.as.filterNot(covered).map(a => (a, "A"))).sorted
      assert(got == want, s"seed $seed")
    }
  }

  test("coalesce(b1, b2) takes b1 per covered origin, else b2, else drops (3 seeds)") {
    seeds.foreach { seed =>
      val m = randomModel(seed)
      val g = G(toGraph(m))
      val got = bag(g.V("A").coalesce(_.out("E"), _.in("F")))
      val want = m.as.flatMap { a =>
        val first = m.outE(a)
        if (first.nonEmpty) first else m.inF(a)
      }.sorted
      assert(got == want, s"seed $seed")
    }
  }

  test("as/select round-trip multiplies by branch fan-out (3 seeds)") {
    seeds.foreach { seed =>
      val m = randomModel(seed)
      val g = G(toGraph(m))
      val got = bag(g.V("A").as("o").out("E").select("o"))
      // one row at the ORIGIN per out-edge traversed
      val want = m.as.flatMap(a => m.outE(a).map(_ => (a, "A"))).sorted
      assert(got == want, s"seed $seed")
    }
  }

  test("coalesce with a single branch equals the branch (3 seeds)") {
    seeds.foreach { seed =>
      val m = randomModel(seed)
      val g = G(toGraph(m))
      assert(bag(g.V("A").coalesce(_.out("E"))) == bag(g.V("A").out("E")),
        s"seed $seed")
    }
  }

  test("where(t) keeps covered origins == not(not(t)) (3 seeds)") {
    seeds.foreach { seed =>
      val m = randomModel(seed)
      val g = G(toGraph(m))
      val got = bag(g.V("A").where(_.out("E")))
      val want = m.as.filter(a => m.outE(a).nonEmpty).map(a => (a, "A")).sorted
      assert(got == want, s"seed $seed")
      assert(got == bag(g.V("A").not(_.not(_.out("E")))),
        s"where(t) != not(not(t)), seed $seed")
    }
  }

  test("where(t) ++ not(t) partitions the frontier (3 seeds)") {
    seeds.foreach { seed =>
      val m = randomModel(seed)
      val g = G(toGraph(m))
      val both = (bag(g.V("A").where(_.in("F"))) ++ bag(g.V("A").not(_.in("F")))).sorted
      assert(both == bag(g.V("A")), s"seed $seed")
    }
  }

  test("project count matches the model's per-origin fan-out, zero-filled (3 seeds)") {
    seeds.foreach { seed =>
      val m = randomModel(seed)
      val g = G(toGraph(m))
      val got = g.V("A")
        .project(Projection.count("n")(_.out("E")))
        .select(col(GC.Id), col("n")).as[(Long, Long)].collect().toSeq.sorted
      val want = m.as.map(a => (a, m.outE(a).size.toLong)).sorted
      assert(got == want, s"seed $seed")
      // covered origins agree with the as/select groupCount of the branch
      val viaSelect = g.V("A").as("o").out("E").select("o").groupCount()
        .select(col(GC.Id), col("cnt")).as[(Long, Long)].collect().toSeq.sorted
      assert(got.filter(_._2 > 0) == viaSelect, s"project vs select-groupCount, seed $seed")
    }
  }

  test("project preserves traverser multiplicity and null-fills agg fields (3 seeds)") {
    seeds.foreach { seed =>
      val m = randomModel(seed)
      val g = G(toGraph(m))
      // frontier with multiplicity: A-vertices once per inbound F edge
      val frontier = g.V("B").out("F", "A")
      val rows = frontier.project(Projection.count("n")(_.out("E")))
        .select(col(GC.Id)).as[Long].collect().toSeq.sorted
      assert(rows == m.fBA.map(_._2).sorted, s"multiplicity lost, seed $seed")
    }
  }
}
