package graft.operators

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.graph.PropertyGraph
import graft.model.{Direction, EdgeSpec, GraphColumns => GC}

/** Traversal-algebra property suite — the role the reference fills by
  * running TinkerPop's StructureStandardSuite
  * (reference: src/test/java/.../TorcGraphStructureStandardTest.java:25-28):
  * every combinator law is checked on seeded-random graphs against a
  * brute-force in-memory relation model, so fuse/intersect/subtract/
  * traverse semantics are pinned down algebraically, not just on the
  * fixture queries.
  *
  * Model: a traversal result is a MULTISET of (src, srcLabel, dst,
  * dstLabel) rows; combinators are relation algebra (composition,
  * semi/anti restriction). Each property runs over [[seeds]] independent
  * random graphs.
  */
class TraversalAlgebraSpec extends SparkSpec {
  import spark.implicits._

  private val seeds = Seq(11, 42, 97)

  // ---- brute-force model ----

  private type Row4 = (Long, String, Long, String)

  private case class Model(
      vertices: Map[String, Seq[Long]],
      edges: Map[EdgeSpec, Seq[(Long, Long)]]) {
    def out(edgeLabel: String, frontierLabel: String): Seq[Row4] =
      edges.toSeq.collect {
        case (s, es) if s.label == edgeLabel && s.srcLabel == frontierLabel =>
          es.map { case (a, b) => (a, s.srcLabel, b, s.dstLabel) }
      }.flatten
    def in(edgeLabel: String, frontierLabel: String): Seq[Row4] =
      edges.toSeq.collect {
        case (s, es) if s.label == edgeLabel && s.dstLabel == frontierLabel =>
          es.map { case (a, b) => (b, s.dstLabel, a, s.srcLabel) }
      }.flatten
    def both(edgeLabel: String, l: String): Seq[Row4] = out(edgeLabel, l) ++ in(edgeLabel, l)
  }

  private def randomModel(seed: Int): Model = {
    val rnd = new Random(seed)
    val as = (0L until (4 + rnd.nextInt(5))).toSeq
    val bs = (100L until (100L + 3 + rnd.nextInt(5))).toSeq
    def randomEdges(src: Seq[Long], dst: Seq[Long], n: Int): Seq[(Long, Long)] =
      Seq.fill(n)((src(rnd.nextInt(src.size)), dst(rnd.nextInt(dst.size)))).distinct
    Model(
      Map("A" -> as, "B" -> bs),
      Map(
        EdgeSpec("E", "A", "A") -> randomEdges(as, as, 12 + rnd.nextInt(8)),
        EdgeSpec("E", "A", "B") -> randomEdges(as, bs, 10 + rnd.nextInt(8)),
        EdgeSpec("F", "B", "A") -> randomEdges(bs, as, 10 + rnd.nextInt(8))))
  }

  private def toGraph(m: Model): PropertyGraph =
    new PropertyGraph(spark,
      m.vertices.map { case (l, ids) => l -> ids.toDF(GC.Id) },
      m.edges.map { case (s, es) => s -> es.toDF(GC.Src, GC.Dst) })

  private def rows(df: DataFrame): Seq[Row4] =
    df.select(col(GC.Src), col(GC.SrcLabel), col(GC.Dst), col(GC.DstLabel))
      .as[Row4].collect().toSeq

  /** Multiset equality. */
  private def assertBag(got: Seq[Row4], want: Seq[Row4], hint: String): Unit =
    assert(got.sorted == want.sorted, hint)

  private def tr(rs: Seq[Row4]): TraversalResult =
    TraversalResult(rs.toDF(GC.Src, GC.SrcLabel, GC.Dst, GC.DstLabel), Nil)

  /** Model composition with multiplicity (path counting). */
  private def composeModel(a: Seq[Row4], b: Seq[Row4]): Seq[Row4] =
    for {
      (x, xl, y, yl) <- a
      (y2, y2l, z, zl) <- b
      if y == y2 && yl == y2l
    } yield (x, xl, z, zl)

  private def eachSeed(f: (Model, PropertyGraph) => Unit): Unit =
    seeds.foreach { s =>
      val m = randomModel(s)
      f(m, toGraph(m))
    }

  // ---- traverse vs model ----

  test("P1: OUT traverse equals the model relation, multiplicity included") {
    eachSeed { (m, g) =>
      assertBag(rows(g.traverseAll("A", "E", Direction.Out).df),
        m.out("E", "A"), "OUT mismatch")
    }
  }

  test("P2: IN traverse equals the reversed model relation") {
    eachSeed { (m, g) =>
      assertBag(rows(g.traverseAll("A", "F", Direction.In).df),
        m.in("F", "A"), "IN mismatch")
    }
  }

  test("P3: BOTH equals OUT union-all IN (each stored direction once)") {
    eachSeed { (m, g) =>
      assertBag(rows(g.traverseAll("A", "E", Direction.Both).df),
        m.both("E", "A"), "BOTH vs model")
      assertBag(rows(g.traverseAll("A", "E", Direction.Both).df),
        rows(g.traverseAll("A", "E", Direction.Out).df) ++
          rows(g.traverseAll("A", "E", Direction.In).df),
        "BOTH vs OUT ++ IN")
    }
  }

  test("P4: an explicit full frontier equals the traverseAll fast path") {
    eachSeed { (m, g) =>
      assertBag(rows(g.traverse(g.frontier("A"), "A", "E", Direction.Out).df),
        rows(g.traverseAll("A", "E", Direction.Out).df), "RI fast-path equivalence")
    }
  }

  test("P5: a frontier subset restricts sources exactly") {
    eachSeed { (m, g) =>
      val sub = m.vertices("A").filter(_ % 2 == 0)
      assertBag(rows(g.traverse(sub.toDF(GC.Id), "A", "E", Direction.Out).df),
        m.out("E", "A").filter(r => sub.contains(r._1)), "frontier restriction")
    }
  }

  test("P6: neighborLabels pruning equals post-filtering on dst label") {
    eachSeed { (m, g) =>
      assertBag(rows(g.traverseAll("A", "E", Direction.Out, neighborLabels = Seq("B")).df),
        m.out("E", "A").filter(_._4 == "B"), "label pruning")
    }
  }

  // ---- derived sets ----

  test("P7: vSet is the distinct neighbor set") {
    eachSeed { (m, g) =>
      val r = g.traverseAll("A", "E", Direction.Out)
      val got = r.vSet.as[(Long, String)].collect().toSeq
      assert(got.distinct == got, "vSet carries duplicates")
      assert(got.toSet == m.out("E", "A").map(x => (x._3, x._4)).toSet)
    }
  }

  test("P8: keylist is the distinct source set") {
    eachSeed { (m, g) =>
      val r = g.traverseAll("A", "E", Direction.Out)
      val got = r.keylist.as[(Long, String)].collect().toSeq
      assert(got.distinct == got)
      assert(got.toSet == m.out("E", "A").map(x => (x._1, x._2)).toSet)
    }
  }

  test("P9: degrees equal per-source model counts") {
    eachSeed { (m, g) =>
      val got = g.traverseAll("A", "E", Direction.Out).degrees
        .as[(Long, Long)].collect().toMap
      val want = m.out("E", "A").groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
      assert(got == want)
    }
  }

  test("P10: vMap list sizes equal degrees") {
    eachSeed { (_, g) =>
      val r = g.traverseAll("A", "E", Direction.Both)
      val sizes = r.vMap.select(col(GC.Id), size(col("neighbors")).cast("long"))
        .as[(Long, Long)].collect().toMap
      val degs = r.degrees.as[(Long, Long)].collect().toMap
      assert(sizes == degs)
    }
  }

  // ---- fuse ----

  test("P11: fuse composes relations with path multiplicity") {
    eachSeed { (m, g) =>
      val a = g.traverseAll("A", "E", Direction.Out, neighborLabels = Seq("B"))
      val b = g.traverseAll("B", "F", Direction.Out)
      assertBag(rows(a.fuse(b, dedup = false).df),
        composeModel(m.out("E", "A").filter(_._4 == "B"), m.out("F", "B")),
        "fuse multiplicity")
    }
  }

  test("P12: fuse(dedup=true) equals distinct of fuse(dedup=false)") {
    eachSeed { (_, g) =>
      val a = g.traverseAll("A", "E", Direction.Out, neighborLabels = Seq("B"))
      val b = g.traverseAll("B", "F", Direction.Out)
      assertBag(rows(a.fuse(b, dedup = true).df),
        rows(a.fuse(b, dedup = false).df).distinct, "dedup fuse")
    }
  }

  test("P13: fuse is associative (multiplicity form)") {
    eachSeed { (_, g) =>
      val a = g.traverseAll("A", "E", Direction.Out, neighborLabels = Seq("B"))
      val b = g.traverseAll("B", "F", Direction.Out)
      val c = g.traverseAll("A", "E", Direction.Out)
      assertBag(rows(a.fuse(b, dedup = false).fuse(c, dedup = false).df),
        rows(a.fuse(b.fuse(c, dedup = false), dedup = false).df), "fuse assoc")
    }
  }

  test("P14: fuse is associative under dedup (set form)") {
    eachSeed { (_, g) =>
      val a = g.traverseAll("A", "E", Direction.Out, neighborLabels = Seq("B"))
      val b = g.traverseAll("B", "F", Direction.Out)
      val c = g.traverseAll("A", "E", Direction.Out)
      assert(rows(a.fuse(b, dedup = true).fuse(c, dedup = true).df).toSet ==
        rows(a.fuse(b.fuse(c, dedup = true), dedup = true).df).toSet)
    }
  }

  test("P15: fusing with the identity relation is the identity") {
    eachSeed { (m, g) =>
      val a = g.traverseAll("A", "E", Direction.Out)
      val ident = tr((m.vertices("A").map(v => (v, "A", v, "A")) ++
        m.vertices("B").map(v => (v, "B", v, "B"))))
      assertBag(rows(a.fuse(ident, dedup = false).df), rows(a.df), "right identity")
      val identA = tr(m.vertices("A").map(v => (v, "A", v, "A")))
      assertBag(rows(identA.fuse(a, dedup = false).df), rows(a.df), "left identity")
    }
  }

  // ---- intersect / subtract set laws ----

  private def vset(ids: Seq[Long], label: String): DataFrame =
    ids.map((_, label)).toDF(GC.Id, GC.Label)

  test("P16: intersect(S) and subtract(S) partition the result") {
    eachSeed { (m, g) =>
      val r = g.traverseAll("A", "E", Direction.Out)
      val s = vset(m.vertices("A").filter(_ % 2 == 0), "A")
      assertBag(rows(r.intersect(s).df) ++ rows(r.subtract(s).df), rows(r.df),
        "partition law")
    }
  }

  test("P17: intersect is idempotent") {
    eachSeed { (m, g) =>
      val r = g.traverseAll("A", "E", Direction.Out)
      val s = vset(m.vertices("A").take(3), "A")
      assertBag(rows(r.intersect(s).intersect(s).df), rows(r.intersect(s).df), "idempotence")
    }
  }

  test("P18: subtract(S) then intersect(S) is empty") {
    eachSeed { (m, g) =>
      val r = g.traverseAll("A", "E", Direction.Out)
      val s = vset(m.vertices("A").take(3), "A")
      assert(rows(r.subtract(s).intersect(s).df).isEmpty)
    }
  }

  test("P19: intersect with the full neighbor set is the identity; subtract with it is empty") {
    eachSeed { (_, g) =>
      val r = g.traverseAll("A", "E", Direction.Both)
      assertBag(rows(r.intersect(r.vSet).df), rows(r.df), "full intersect")
      assert(rows(r.subtract(r.vSet).df).isEmpty, "full subtract")
    }
  }

  test("P20: chained intersects equal intersect of the set intersection") {
    eachSeed { (m, g) =>
      val r = g.traverseAll("A", "E", Direction.Out)
      val s1ids = m.vertices("A").filter(_ % 2 == 0)
      val s2ids = m.vertices("A").filter(_ % 3 == 0)
      assertBag(rows(r.intersect(vset(s1ids, "A")).intersect(vset(s2ids, "A")).df),
        rows(r.intersect(vset(s1ids.intersect(s2ids), "A")).df), "intersect chain")
    }
  }

  test("P21: subtract of a union equals chained subtracts") {
    eachSeed { (m, g) =>
      val r = g.traverseAll("A", "E", Direction.Out)
      val s1 = m.vertices("A").filter(_ % 2 == 0)
      val s2 = m.vertices("A").filter(_ % 3 == 0)
      assertBag(rows(r.subtract(vset((s1 ++ s2).distinct, "A")).df),
        rows(r.subtract(vset(s1, "A")).subtract(vset(s2, "A")).df), "De Morgan")
    }
  }

  test("P22: intersect(S) equals subtract(vSet minus S)") {
    eachSeed { (m, g) =>
      val r = g.traverseAll("A", "E", Direction.Out)
      val s = m.vertices("A").filter(_ % 2 == 0)
      val complement = r.vSet.as[(Long, String)].collect().toSeq
        .filterNot { case (id, l) => l == "A" && s.contains(id) }
      assertBag(rows(r.intersect(vset(s, "A")).df),
        rows(r.subtract(complement.toDF(GC.Id, GC.Label)).df), "complement law")
    }
  }

  // ---- predicate combinators ----

  test("P23: removeEdgeIf and filter on the same predicate partition the result") {
    eachSeed { (_, g) =>
      val r = g.traverseAll("A", "E", Direction.Out)
      val cond = col(GC.Dst) % 2 === 0
      assertBag(rows(r.filter(cond).df) ++ rows(r.removeEdgeIf(cond).df),
        rows(r.df), "predicate partition")
    }
  }

  test("P24: removeEdgeIf(false) and filter(true) are identities") {
    eachSeed { (_, g) =>
      val r = g.traverseAll("A", "E", Direction.Out)
      assertBag(rows(r.removeEdgeIf(lit(false)).df), rows(r.df), "remove-nothing")
      assertBag(rows(r.filter(lit(true)).df), rows(r.df), "keep-everything")
    }
  }

  // ---- DSL repeat-until / emit laws (the E edge is cyclic A→A plus
  // A→B, so traversers can loop, branch, and exit — the shapes a
  // fixture DAG can't produce) ----

  /** In-memory mirror of the repeatUntil superstep loop: hop every
    * frontier row along E, exit rows landing on `exitLabel`, keep
    * hopping the rest, drop whatever remains after maxIter. Multiset
    * semantics — multiplicity counts paths. */
  private def untilModel(m: Model, start: Seq[(Long, String)],
      exitLabel: String, maxIter: Int): Seq[(Long, String)] = {
    var frontier = start
    val exited = Seq.newBuilder[(Long, String)]
    var i = 0
    while (i < maxIter && frontier.nonEmpty) {
      val next = frontier.flatMap { case (id, l) =>
        m.out("E", l).collect { case (s, _, d, dl) if s == id => (d, dl) }
      }
      val (pass, fail) = next.partition(_._2 == exitLabel)
      exited ++= pass
      frontier = fail
      i += 1
    }
    exited.result()
  }

  test("P25: repeatUntil equals the superstep model on cyclic random graphs") {
    eachSeed { (m, g) =>
      val got = graft.dsl.G(g).V("A")
        .repeatUntil(col(GC.Label) === "B", maxIter = 3)(_.out("E"))
        .toDF.select(col(GC.Id), col(GC.Label))
        .as[(Long, String)].collect().toSeq
      val want = untilModel(m, m.vertices("A").map(_ -> "A"), "B", 3)
      assert(got.sorted == want.sorted,
        s"until mismatch: got ${got.size} rows, want ${want.size}")
      assert(want.nonEmpty, "degenerate seed: no traverser ever exits")
    }
  }

  test("P27: choose routes every traverser exactly once (random graphs)") {
    eachSeed { (m, g) =>
      val got = graft.dsl.G(g).V("A")
        .choose(col(GC.Id) % 2 === 0)(_.out("E"), identity)
        .toDF.select(col(GC.Id), col(GC.Label))
        .as[(Long, String)].collect().toSeq
      val evens = m.vertices("A").filter(_ % 2 == 0).flatMap(id =>
        m.out("E", "A").collect { case (s, _, d, dl) if s == id => (d, dl) })
      val odds = m.vertices("A").filter(_ % 2 != 0).map(id => (id, "A"))
      assert(got.sorted == (evens ++ odds).sorted)
    }
  }

  test("P26: emit predicate == post-filter on the emitted union (random graphs)") {
    eachSeed { (_, g) =>
      val D = graft.dsl.Step.DepthCol
      def triples(df: DataFrame) =
        df.select(col(D), col(GC.Id), col(GC.Label))
          .as[(Int, Long, String)].collect().toSeq.sorted
      val filtered = graft.dsl.G(g).V("A")
        .repeatEmit(2, emitPred = col(GC.Label) === "B")(_.out("E")).toDF
      val law = graft.dsl.G(g).V("A")
        .repeatEmit(2)(_.out("E")).toDF.where(col(GC.Label) === "B")
      assert(triples(filtered) == triples(law))
      assert(triples(filtered).nonEmpty)
    }
  }
}
