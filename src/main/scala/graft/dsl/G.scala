package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.graph.PropertyGraph
import graft.model.{Direction, GraphColumns => GC}

/** Chainable traversal DSL over a [[PropertyGraph]] — the public verb
  * surface a user of the reference's Gremlin API writes against
  * (`g.V().has(...).out(...).values(...)`; the reference inherits the
  * whole step library from gremlin-core, SURVEY.md §2.1, and adds only
  * the bulk vertex step O24/O25 — which is this engine's native
  * execution model anyway). Each verb composes a lazy DataFrame; nothing
  * executes until an action. Torc-native set verbs (traverse/fuse/
  * intersect/subtract, TorcHelper.java:416-646) remain available on
  * [[graft.operators.TraversalResult]]; this layer covers the standard
  * filter/expand/group/count/order/limit surface.
  *
  * Each Step tracks the set of labels its frontier can hold, so label
  * pruning is structural (only matching per-label frames are unioned) —
  * the same effect as the reference's hasLabel pushdown strategy
  * (TorcGraphProviderOptimizationStrategy.java:74-103), obtained by
  * construction rather than by a rewrite rule.
  *
  * Multiplicity follows join semantics, matching the reference's
  * traverser fan-out (TorcVertexStep.java:123-130); use `dedup()` for
  * set semantics.
  */
final case class G(graph: PropertyGraph) {

  /** All vertices: `g.V()`. */
  def V(): Step = {
    val frames = graph.vertexLabels.map { l =>
      graph.vertices(l).select(col(GC.Id), lit(l).as(GC.Label))
    }
    Step(graph, frames.reduce(_.unionByName(_)), graph.vertexLabels)
  }

  /** All vertices of one label: `g.V("Customer")`. Keeps the label's
    * property columns in the step so an immediately following `has()`
    * is a plain pushed-down filter, not a self-join. */
  def V(label: String): Step =
    Step(graph,
      graph.vertices(label).withColumn(GC.Label, lit(label)),
      Seq(label))

  /** Point lookup: `g.V("Customer", 1, 2, 3)` (O4 semantics: misses are
    * simply absent). */
  def V(label: String, ids: Long*): Step =
    Step(graph,
      graph.verticesById(label, ids).select(col(GC.Id), lit(label).as(GC.Label)),
      Seq(label))
}

final case class Step(graph: PropertyGraph, df: DataFrame, labels: Seq[String],
    captures: Map[String, Seq[String]] = Map.empty) {

  /** Filter on a vertex property — Gremlin `has(key, value)`. */
  def has(key: String, value: Any): Step = has(col(key) === lit(value))

  /** Filter on vertex properties — Gremlin `has(predicate)`. Each label's
    * branch joins its full vertex frame (Catalyst prunes to the columns
    * the predicate touches); a label whose schema cannot resolve the
    * predicate contributes no rows, matching `has()` on a property the
    * vertex lacks. */
  def has(cond: Column): Step = {
    // Fast path: the step still carries the property columns (fresh
    // V(label) scan) — filter in place, no join; Catalyst pushes the
    // predicate into the scan.
    val direct = scala.util.Try(df.filter(cond).schema).toOption
      .map(_ => copy(df = df.filter(cond)))
    direct.getOrElse {
      // Carried columns (`_path`, `_as_` captures) must survive the
      // hydration join — dropping them here would break a later
      // select()/paths() and the optional/coalesce origin tracking.
      val keepCols = Seq(GC.Id, GC.Label) ++ df.columns.filter(isCarried)
      val attempts = labels.map { l =>
        val v = graph.vertices(l)
        val proj = v.withColumnRenamed(GC.Id, "_hid")
        val sub = df.select(keepCols.map(col): _*).where(col(GC.Label) === l)
        val joined = sub.join(proj, sub(GC.Id) === proj("_hid")).where(cond)
          .select(keepCols.map(c => sub(c)): _*)
        // Analysis check: does this label's schema resolve the predicate?
        val ok = scala.util.Try(joined.schema).isSuccess
        (l, joined, ok)
      }
      val kept = attempts.filter(_._3)
      copy(df = nonEmptyUnion(kept.map(_._2)), labels = kept.map(_._1))
    }
  }

  /** Mid-chain id filter — Gremlin `hasId(ids...)`: keep only frontier
    * elements with one of the given ids. The reference composes point
    * lookups with traversals the same way (`g.V(ids).out()...`,
    * TorcGraph.java:327-373); here the In-filter lands on the current
    * frontier and, on a fresh `V(label)` scan, Catalyst pushes it into
    * the Parquet read exactly like the `V(label, ids...)` start step.
    *
    * SINGLE-LABEL ONLY: ids here are label-local key spaces (c_custkey
    * and n_nationkey overlap), unlike the reference's globally-unique
    * 128-bit element ids (TorcGraph UInt128) — on a mixed frontier a
    * bare long would silently match id-5 vertices of EVERY label, so
    * multi-label frontiers must use the (label, id) overload. */
  def hasId(ids: Long*): Step = {
    require(labels.size <= 1,
      s"hasId(ids...) on a multi-label frontier ($labels) is ambiguous — " +
        "ids are label-local; use hasElementId(label -> id, ...) instead")
    copy(df = df.where(col(GC.Id).isin(ids: _*)))
  }

  /** [[hasId]] for mixed frontiers: keep elements matching one of the
    * given (label, id) pairs — the full element identity, matching the
    * reference's globally-unique UInt128 ids on a per-label layout. */
  def hasElementId(pairs: (String, Long)*): Step = {
    require(pairs.nonEmpty, "hasElementId needs at least one (label, id) pair")
    val wanted = pairs.map { case (l, i) =>
      struct(lit(l), lit(i).cast("bigint"))
    }
    copy(
      df = df.where(struct(col(GC.Label), col(GC.Id).cast("bigint"))
        .isin(wanted: _*)),
      labels = labels.filter(pairs.map(_._1).toSet))
  }

  /** hasLabel step — structural pruning, not a runtime filter. */
  def hasLabel(ls: String*): Step = {
    val kept = labels.filter(ls.contains)
    copy(df = df.where(col(GC.Label).isin(ls: _*)), labels = kept)
  }

  /** One-hop expansion — Gremlin `out/in/both(label)`. */
  def out(edgeLabel: String, neighborLabels: String*): Step =
    expand(edgeLabel, Direction.Out, fillEdge = false, neighborLabels)
  def in(edgeLabel: String, neighborLabels: String*): Step =
    expand(edgeLabel, Direction.In, fillEdge = false, neighborLabels)
  def both(edgeLabel: String, neighborLabels: String*): Step =
    expand(edgeLabel, Direction.Both, fillEdge = false, neighborLabels)

  /** Expansion keeping edge property columns — Gremlin `outE`/`inE`;
    * follow with `where` for edge-property predicates (removeEdgeIf). */
  def outE(edgeLabel: String, neighborLabels: String*): Step =
    expand(edgeLabel, Direction.Out, fillEdge = true, neighborLabels)
  def inE(edgeLabel: String, neighborLabels: String*): Step =
    expand(edgeLabel, Direction.In, fillEdge = true, neighborLabels)

  /** Edge-keeping BOTH expansion — Gremlin `bothE` (reference
    * single-vertex surface, TorcGraph.java:1281-1398): the union of the
    * [[outE]] and [[inE]] expansions, one row per stored direction, edge
    * property columns kept. */
  def bothE(edgeLabel: String, neighborLabels: String*): Step =
    expand(edgeLabel, Direction.Both, fillEdge = true, neighborLabels)

  private def expand(edgeLabel: String, dir: Direction, fillEdge: Boolean,
      neighborLabels: Seq[String]): Step = {
    // Columns that ride along through expansions: the `_path` history and
    // any `as(name)` capture structs.
    val carried = df.columns.filter(isCarried).toSeq
    val parts = labels.flatMap { l =>
      val matching = graph.edgeFrames.keys.exists { s =>
        s.label == edgeLabel && (dir match {
          case Direction.Out  => s.srcLabel == l
          case Direction.In   => s.dstLabel == l
          case Direction.Both => s.srcLabel == l || s.dstLabel == l
        })
      }
      if (!matching) None
      else {
        val sub = df.where(col(GC.Label) === l)
        if (carried.isEmpty) {
          val r = graph.traverse(sub.select(col(GC.Id)), l, edgeLabel, dir,
            fillEdge, neighborLabels)
          val keep = Seq(col(GC.Dst).as(GC.Id), col(GC.DstLabel).as(GC.Label)) ++
            r.edgePropCols.map(col)
          Some((r.df.select(keep: _*), r))
        } else {
          // Carried mode: traverse a distinct frontier, then fan the edge
          // rows back onto the per-row carried columns (multiplicity =
          // input rows x edges, same as the non-carried join semantics).
          val r = graph.traverse(sub.select(col(GC.Id)).distinct(), l, edgeLabel,
            dir, fillEdge, neighborLabels)
          val rows = sub.select(col(GC.Id).as("_pid") +: carried.map(col): _*)
          val joined = r.df.join(rows, r.df(GC.Src) === rows("_pid"))
          val carriedOut = carried.map {
            case PathCol => concat(col(PathCol),
              array(struct(col(GC.DstLabel).as("label"), col(GC.Dst).cast("bigint").as("id"))))
              .as(PathCol)
            case c => col(c)
          }
          val keep = Seq(col(GC.Dst).as(GC.Id), col(GC.DstLabel).as(GC.Label)) ++
            r.edgePropCols.map(col) ++ carriedOut
          Some((joined.select(keep: _*), r))
        }
      }
    }
    // An edge label that exists nowhere in the graph is a typo — fail
    // loudly. A label that exists but has no adjacency FROM this
    // frontier is a legitimately empty hop (Gremlin semantics; required
    // for optional/coalesce branches that don't apply to every label).
    if (parts.isEmpty) {
      require(graph.edgeFrames.keys.exists(_.label == edgeLabel),
        s"edge label '$edgeLabel' does not exist in this graph")
      val keep = Seq(col(GC.Id), col(GC.Label)) ++
        df.columns.filter(isCarried).map(col)
      return copy(df = df.select(keep: _*).where(lit(false)), labels = Seq.empty)
    }
    val outDf = parts.map(_._1).reduce(_.unionByName(_, allowMissingColumns = true))
    val newLabels = graph.vertexLabels.filter { nl =>
      graph.edgeFrames.keys.exists { s =>
        s.label == edgeLabel &&
        (neighborLabels.isEmpty ||
          neighborLabels.contains(nl)) && (dir match {
          case Direction.Out  => labels.contains(s.srcLabel) && s.dstLabel == nl
          case Direction.In   => labels.contains(s.dstLabel) && s.srcLabel == nl
          case Direction.Both => (labels.contains(s.srcLabel) && s.dstLabel == nl) ||
            (labels.contains(s.dstLabel) && s.srcLabel == nl)
        })
      }
    }
    copy(df = outDf, labels = newLabels)
  }

  /** Bounded multi-hop — Gremlin `repeat(step).times(n)`: applies the
    * hop function n times (each application is one more join in the
    * plan; there is no iterative driver loop). */
  def repeat(n: Int)(hop: Step => Step): Step =
    (1 to n).foldLeft(this)((s, _) => hop(s))

  /** Bounded multi-hop emitting EVERY intermediate frontier — Gremlin
    * `repeat(step).emit().times(n)`: the result is the union of the
    * frontiers after 1..n hop applications (plus the input frontier
    * itself with `emitInitial = true`, Gremlin's emit-before-repeat
    * placement), each tagged with its depth in the `_depth` column
    * ([[Step.DepthCol]], the `loops()` value). Multiplicity is
    * preserved per depth — join semantics, like [[repeat]] — and
    * `as()`/`select()` captures ride through, so "all people within 3
    * hops, with where they were found" is one plan: n expansions
    * unioned, no driver loop, no action. Not a fixpoint: for unbounded
    * reachability use [[untilFixpoint]].
    *
    * `materialize = true` switches to the SUPERSTEP discipline: each
    * hop's frontier is `localCheckpoint`ed before the next hop, so
    * every expansion executes exactly once. The default lazy unroll
    * embeds depth d-1's whole subplan inside depth d — O(n²) expansion
    * instances — and while AQE's ReusedExchange dedupes the repeated
    * SHUFFLES, the operators above each reused exchange re-execute per
    * subtree; for deep unrolls over expensive hop inputs (q33's reply
    * trees: 24 s lazy vs ~2 s materialized at sf0.1) checkpointing is
    * the affordable form. Costs one action per depth and trades plan
    * purity for bounded lineage — the same trade [[untilFixpoint]]
    * makes. */
  def repeatEmit(n: Int, emitInitial: Boolean = false,
      emitPred: Column = null, materialize: Boolean = false)(hop: Step => Step): Step = {
    require(n >= 1, s"repeatEmit needs n >= 1, got $n")
    val frontiers = Seq.newBuilder[(Int, Step)]
    var cur = this
    if (emitInitial) frontiers += ((0, cur))
    var d = 1
    var drained = false
    while (d <= n && !drained) {
      cur = hop(cur)
      if (materialize) {
        // superstep mode: bound lineage AND stop early once a frontier
        // drains — the materialized frame makes the emptiness check
        // free, and every deeper frontier is necessarily empty too
        cur = cur.copy(df = cur.df.localCheckpoint())
        drained = cur.df.isEmpty
      }
      frontiers += ((d, cur))
      d += 1
    }
    val fs = frontiers.result()
    val dfs = fs.map { case (d, st) =>
      // emit(pred): only frontier rows satisfying the predicate are
      // emitted (Gremlin's emit(traversal) filter); the REPETITION is
      // unaffected — every frontier keeps hopping.
      val emitted =
        if (emitPred == null) st.df else st.partitionByPredicate(emitPred)._1
      emitted.withColumn(Step.DepthCol, lit(d))
    }
    copy(
      df = dfs.reduce(_.unionByName(_, allowMissingColumns = true)),
      labels = fs.flatMap(_._2.labels).distinct.sorted,
      captures = fs.map(_._2.captures).foldLeft(captures)(mergeCaptures))
  }

  /** Iterative fixpoint — Gremlin `repeat(step).until(no new results)`:
    * expands level by level, accumulating the visited (label, id) set and
    * stopping when a level adds nothing new (or at `maxIter`). Returns
    * the visited set as the new frontier.
    *
    * This is a driver-coordinated superstep loop (the DataFrame analogue
    * of Pregel): each level is one distributed join, `localCheckpoint`
    * cuts the plan after every level so lineage stays linear instead of
    * exponential, and the anti-join against the visited set is what
    * guarantees termination on cyclic graphs. For whole-graph iterative
    * analytics prefer [[graft.analytics.GraphXBridge]]. */
  def untilFixpoint(maxIter: Int = 20)(hop: Step => Step): Step = {
    var visited = df.select(col(GC.Id), col(GC.Label))
      .dropDuplicates(GC.Id, GC.Label).localCheckpoint()
    var frontier = copy(df = visited)
    var seenLabels = labels.toSet
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val next = hop(frontier)
      val fresh = next.df.select(col(GC.Id), col(GC.Label))
        .dropDuplicates(GC.Id, GC.Label)
        .join(visited, Seq(GC.Id, GC.Label), "left_anti")
        .localCheckpoint()
      if (fresh.isEmpty) done = true
      else {
        visited = visited.unionByName(fresh).localCheckpoint()
        seenLabels ++= next.labels
        frontier = next.copy(df = fresh)
        iter += 1
      }
    }
    copy(df = visited, labels = seenLabels.toSeq.sorted)
  }

  /** Predicate-terminated repetition — Gremlin `repeat(hop).until(pred)`
    * (do/while, matching the until-after-repeat placement): after each
    * hop, traversers satisfying `pred` EXIT the loop into the result;
    * the rest hop again. `pred` is a Column over the frontier's columns;
    * referenced property columns the frontier no longer carries are
    * hydrated per label, and a label whose schema lacks one can never
    * satisfy the predicate (the `has()` convention) — its traversers
    * keep looping. Traversers still unsatisfied at `maxIter` are
    * DROPPED (the reference's inherited step machinery would loop them
    * forever; a bound is the batch-engine analogue).
    *
    * Driver-coordinated superstep loop like [[untilFixpoint]]: one
    * distributed pass per level, `localCheckpoint` keeps lineage linear
    * on cyclic graphs, and the per-level empty check is the only
    * action. */
  def repeatUntil(pred: Column, maxIter: Int = 20)(hop: Step => Step): Step = {
    require(maxIter >= 1, s"repeatUntil needs maxIter >= 1, got $maxIter")
    var cur = this
    var exited: DataFrame = null
    var exitLabels = Set.empty[String]
    var exitCaptures = captures
    var iter = 0
    var drained = false
    while (!drained && iter < maxIter) {
      val next = hop(cur)
      val (pass, fail) = next.partitionByPredicate(pred)
      exited =
        if (exited == null) pass
        else exited.unionByName(pass, allowMissingColumns = true)
      exitLabels ++= next.labels
      exitCaptures = mergeCaptures(exitCaptures, next.captures)
      val failCk = fail.localCheckpoint()
      drained = failCk.isEmpty
      cur = next.copy(df = failCk)
      iter += 1
    }
    copy(df = exited, labels = exitLabels.toSeq.sorted, captures = exitCaptures)
  }

  /** Split the frontier by a predicate: (rows satisfying, rows not —
    * including null evaluations and rows of labels whose schema cannot
    * resolve a referenced property). Referenced columns the frontier
    * doesn't carry are hydrated PER LABEL with that label's resolvable
    * subset, null-filling columns the label's schema lacks — so a
    * disjunctive predicate over label-specific properties (e.g.
    * `n_name === x || r_name === y` on a Nation∪Region frontier)
    * evaluates each disjunct exactly where `has()` would: a label
    * missing one column can still satisfy the predicate through
    * another (null operands propagate per SQL three-valued logic, and
    * a null RESULT routes to the false side). One lookup row per
    * element, so multiplicity is untouched; both halves are projected
    * back to the step's own columns. */
  private[dsl] def partitionByPredicate(pred: Column): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.Attribute
    val orFalse = org.apache.spark.sql.functions.coalesce(pred, lit(false))
    val refs = org.apache.spark.sql.GraftSqlShims.catalystExpression(pred).collect {
      case ua: UnresolvedAttribute => ua.name
      case a: Attribute => a.name
    }.distinct
    val missing = refs.filterNot(df.columns.contains)
    if (missing.isEmpty)
      (df.filter(pred), df.filter(!orFalse))
    else {
      val lookup = nonEmptyUnion2(
        labels.flatMap { l =>
          val schema = graph.vertices(l).columns.toSet
          val (have, lack) = missing.partition(schema.contains)
          // a label resolving NO referenced column contributes nothing:
          // the left join below null-fills its rows identically
          if (have.isEmpty) None
          else {
            val base = df.where(col(GC.Label) === l)
              .select(col(GC.Id), col(GC.Label)).dropDuplicates(GC.Id, GC.Label)
            Some(graph.hydrate(base, GC.Id, l, have)
              .select(Seq(col(GC.Id), col(GC.Label)) ++
                missing.map(m => if (lack.contains(m)) lit(null).as(m) else col(m)): _*))
          }
        },
        df.select(Seq(col(GC.Id), col(GC.Label)) ++
          missing.map(m => lit(null).as(m)): _*).where(lit(false)))
      val own = df.columns.toSeq
      val withCols = df.join(lookup, Seq(GC.Id, GC.Label), "left")
      (withCols.filter(orFalse).select(own.map(col): _*),
       withCols.filter(!orFalse).select(own.map(col): _*))
    }
  }

  /** Arbitrary predicate over current columns (edge props after outE/inE). */
  def where(cond: Column): Step = copy(df = df.filter(cond))

  /** Gremlin `dedup()`. */
  def dedup(): Step = copy(df = df.dropDuplicates(GC.Id, GC.Label))

  /** Deterministic `order().by(label, id).limit(n)`. */
  def limit(n: Int): Step = copy(df = df.orderBy(GC.Label, GC.Id).limit(n))

  /** Gremlin `order().by(key)`: sort the frontier by a property value
    * (hydrated per label if the step no longer carries it), with a
    * (label, id) tie-break for determinism. Labels whose schema lacks
    * the key contribute no rows — the `has()` convention. All carried
    * columns (edge properties from outE/inE, the `_path` column) are
    * preserved: the hydrated key is joined BACK onto the frontier
    * rather than replacing it, and per-row multiplicity is untouched
    * (the key lookup is deduplicated before the join). */
  def orderBy(key: String, ascending: Boolean = true): Step = {
    val withKey = withKeyColumn(key)
    val k = if (ascending) col(key).asc else col(key).desc
    copy(df = withKey.orderBy(k, col(GC.Label).asc, col(GC.Id).asc))
  }

  /** The frontier with `key` available as a column: as-is when still
    * carried, otherwise hydrated per label and joined back (preserving
    * multiplicity and every carried column — see [[orderBy]]). */
  private def withKeyColumn(key: String): DataFrame =
    if (df.columns.contains(key)) df
    else {
      val kept = labels.filter(l => graph.vertices(l).columns.contains(key))
      val keyLookup = nonEmptyUnion2(kept.map { l =>
        graph.hydrate(
          df.where(col(GC.Label) === l)
            .select(col(GC.Id), col(GC.Label)).dropDuplicates(GC.Id, GC.Label),
          GC.Id, l, Seq(key))
      }, df.select(col(GC.Id), col(GC.Label)).where(lit(false))
        .withColumn(key, lit(null)))
      df.join(keyLookup, Seq(GC.Id, GC.Label))
    }

  /** Project property values — Gremlin `values(keys...)`. */
  def values(keys: String*): DataFrame = {
    if (keys.toSet.subsetOf(df.columns.toSet)) df.select(keys.map(col): _*)
    else {
      val parts = labels
        .filter(l => keys.toSet.subsetOf(graph.vertices(l).columns.toSet))
        .map { l =>
          graph.hydrate(df.where(col(GC.Label) === l).select(col(GC.Id), col(GC.Label)),
            GC.Id, l, keys).select(keys.map(col): _*)
        }
      nonEmptyUnion(parts)
    }
  }

  /** Gremlin `union(branch1, branch2, ...)`: every traverser flows into
    * each branch; outputs concatenate (multiplicity preserved; branches
    * may end at different labels — missing columns null-fill). */
  def union(branches: (Step => Step)*): Step = {
    require(branches.nonEmpty, "union needs at least one branch")
    val outs = branches.map(b => b(this))
    copy(
      df = outs.map(_.df).reduce(_.unionByName(_, allowMissingColumns = true)),
      labels = outs.flatMap(_.labels).distinct.sorted,
      captures = outs.foldLeft(captures)((a, o) => mergeCaptures(a, o.captures)))
  }

  /** Gremlin `optional(branch)`: a traverser is replaced by its branch
    * results when the branch produces any, and passes through unchanged
    * when it produces none (the left-join of traversal steps). Origin
    * tracking rides the capture machinery, so multi-hop branches work. */
  def optional(branch: Step => Step): Step = {
    val (out, missed) = branchSplit(branch)
    copy(
      df = out.df.unionByName(missed, allowMissingColumns = true),
      labels = (out.labels ++ labels).distinct.sorted,
      captures = mergeCaptures(captures, out.captures))
  }

  /** Gremlin `coalesce(branch1, branch2, ...)`: each traverser takes the
    * FIRST branch that produces output for it; traversers matching no
    * branch are dropped. */
  def coalesce(branches: (Step => Step)*): Step = {
    require(branches.nonEmpty, "coalesce needs at least one branch")
    var remaining = this
    var accDf: DataFrame = null
    var accLabels = Seq.empty[String]
    var accCaptures = captures
    branches.foreach { b =>
      val (out, missed) = remaining.branchSplit(b)
      accDf =
        if (accDf == null) out.df
        else accDf.unionByName(out.df, allowMissingColumns = true)
      accLabels = (accLabels ++ out.labels).distinct
      accCaptures = mergeCaptures(accCaptures, out.captures)
      remaining = remaining.copy(df = missed)
    }
    copy(df = accDf, labels = accLabels.sorted, captures = accCaptures)
  }

  /** Gremlin `choose(pred, onTrue, onFalse)`: traversers satisfying the
    * predicate flow into the first branch, the rest into the second;
    * outputs concatenate. `pred` follows [[repeatUntil]]'s hydration
    * rules (property columns hydrate per label; labels that cannot
    * resolve a referenced column route to `onFalse`, and a null
    * evaluation is false — the has() convention). */
  def choose(pred: Column)(onTrue: Step => Step, onFalse: Step => Step): Step = {
    val (pass, fail) = partitionByPredicate(pred)
    val a = onTrue(copy(df = pass))
    val b = onFalse(copy(df = fail))
    copy(
      df = a.df.unionByName(b.df, allowMissingColumns = true),
      labels = (a.labels ++ b.labels).distinct.sorted,
      captures = mergeCaptures(a.captures, b.captures))
  }

  /** Gremlin `not(branch)`: keep only traversers whose branch produces
    * NO output — the complement of [[optional]]'s covered set, i.e. a
    * per-origin-element anti-join. Carried columns and multiplicity of
    * the surviving input rows are untouched. */
  def not(branch: Step => Step): Step = copy(df = branchSplit(branch)._2)

  /** Gremlin `where(traversal)` — keep only traversers whose branch
    * produces at least one output: the per-origin SEMI-join, the
    * positive twin of [[not]] (`where(t)` ≡ `not(not(t))`,
    * BranchAlgebraSpec law). The traversal-valued filter form the
    * reference inherits from gremlin-core (`where(out("X"))`,
    * pom.xml:19-27). Carried columns and multiplicity of the surviving
    * input rows are untouched; [[branchSplit]]'s double-execution cost
    * note applies. */
  def where(branch: Step => Step): Step =
    copy(df = df.join(coveredOrigins(branch), Seq(GC.Id, GC.Label), "left_semi"))

  /** Gremlin `project(a, b, ...).by(subtraversal)...` — per ORIGIN
    * ELEMENT scalar subqueries: each [[Projection]] runs its branch from
    * the DISTINCT frontier elements, aggregates the branch output per
    * origin (count, or an aggregate over a property of the landed
    * elements), and the scalars left-join back onto every traverser row.
    * Result: `(label, id, field1, field2, ...)` — one row per input
    * traverser (multiplicity preserved: duplicated origins repeat with
    * identical scalars, the per-traverser Gremlin semantics).
    * Count projections zero-fill uncovered origins; aggregate
    * projections yield null (SQL scalar-subquery convention). Each
    * branch is one aggregation subplan — no per-element execution, no
    * driver loop. */
  def project(fields: Projection*): DataFrame = {
    require(fields.nonEmpty, "project needs at least one field")
    val names = fields.map(_.name)
    require(names.distinct == names, s"duplicate project field in $names")
    fields.foldLeft(df.select(col(GC.Label), col(GC.Id))) { (acc, field) =>
      val cap = s"${CapPrefix}__project${Step.nextBranchTag()}"
      val origins = copy(df = df
        .select(col(GC.Id), col(GC.Label)).dropDuplicates(GC.Id, GC.Label)
        .withColumn(cap,
          struct(col(GC.Label).as("label"), col(GC.Id).cast("bigint").as("id"))))
      val out = field.branch(origins)
      // aggregate over a landed property: hydrate it per label first
      val outDf = field.key.map(out.withKeyColumn).getOrElse(out.df)
      val scalar = outDf
        .groupBy(col(cap).getField("label").as(GC.Label),
          col(cap).getField("id").as(GC.Id))
        .agg(field.agg(field.key.map(col).getOrElse(lit(1))).as(field.name))
      val joined = acc.join(scalar, Seq(GC.Id, GC.Label), "left")
      if (field.zeroFill)
        joined.withColumn(field.name,
          org.apache.spark.sql.functions.coalesce(col(field.name), lit(0L)))
      else joined
    }
  }

  /** Gremlin `range(lo, hi)` — the deterministic slice [lo, hi) of the
    * frontier ordered by (label, id, fingerprint): duplicate (label, id)
    * rows with different carried values (captures, paths, edge
    * properties) tie-break on an xxhash64 fingerprint of the remaining
    * columns — a cheap fixed-width sort key that works for ANY carried
    * column type (sorting by the columns themselves would reject
    * unorderable types and drag wide payloads through the top-k
    * comparator). `limit(n)` == `range(0, n)`.
    *
    * Both bounds are distributed top-k sorts (TakeOrdered — no window,
    * no single-partition shuffle, no driver materialization beyond
    * `hi` rows); the [lo, hi) slice is their MULTISET difference
    * (`exceptAll`), which subtracts the top-`lo` rows from the
    * top-`hi` rows with duplicate counting. Fully-identical duplicate
    * rows slice by count, exactly like the row-number formulation.
    * (A fingerprint collision between rows with different payloads
    * could in principle make the two top-k evaluations break that tie
    * differently — with 64-bit hashes the risk is negligible.) */
  def range(lo: Int, hi: Int): Step = {
    require(0 <= lo && lo <= hi, s"range needs 0 <= lo <= hi, got [$lo, $hi)")
    val rest = df.columns.filterNot(c => c == GC.Label || c == GC.Id).sorted
    val fp = "_fp"
    val keyed =
      if (rest.isEmpty) df.withColumn(fp, lit(0L))
      else df.withColumn(fp, xxhash64(rest.map(col): _*))
    val order = Seq(col(GC.Label), col(GC.Id), col(fp))
    val top = keyed.orderBy(order: _*).limit(hi)
    val sliced =
      if (lo == 0) top
      else top.exceptAll(keyed.orderBy(order: _*).limit(lo))
    copy(df = sliced.drop(fp))
  }

  /** Gremlin `simplePath()`: drop traversers whose recorded path visits
    * any element twice. Requires [[withPath]]. */
  def simplePath(): Step = {
    require(df.columns.contains(PathCol), "call withPath() before simplePath()")
    copy(df = df.where(size(array_distinct(col(PathCol))) === size(col(PathCol))))
  }

  /** Gremlin `cyclicPath()`: the complement of [[simplePath]]. */
  def cyclicPath(): Step = {
    require(df.columns.contains(PathCol), "call withPath() before cyclicPath()")
    copy(df = df.where(size(array_distinct(col(PathCol))) < size(col(PathCol))))
  }

  /** Run `branch` with an origin capture attached; return (branch output
    * with the capture dropped, input rows whose origin produced no
    * branch output). The split is per ORIGIN ELEMENT (id, label) — a
    * multiplicity-bearing input row passes through with its carried
    * columns intact when uncovered.
    *
    * Cost note: the branch subplan appears TWICE in the composed plan
    * (its output, and the covered-origin set feeding the anti-join).
    * This is deliberate — steps stay lazy plan builders with zero
    * actions, and Spark's ReuseExchange dedupes the shuffle where the
    * subtrees match; for a very expensive branch, materialize the step
    * (`localCheckpoint`) before branching if double execution matters. */
  private def branchSplit(branch: Step => Step): (Step, DataFrame) = {
    val cap = s"${CapPrefix}__origin${Step.nextBranchTag()}"
    val tagged = copy(df = df.withColumn(cap,
      struct(col(GC.Label).as("label"), col(GC.Id).cast("bigint").as("id"))))
    val out = branch(tagged)
    val covered = out.df.select(
      col(cap).getField("id").as(GC.Id),
      col(cap).getField("label").as(GC.Label)).distinct()
    val missed = df.join(covered, Seq(GC.Id, GC.Label), "left_anti")
    (out.copy(df = out.df.drop(cap)), missed)
  }

  /** The distinct (id, label) origin elements whose `branch` produces
    * at least one output — [[branchSplit]]'s covered set without the
    * branch output (for [[where]]'s semi-join). */
  private def coveredOrigins(branch: Step => Step): DataFrame = {
    val cap = s"${CapPrefix}__origin${Step.nextBranchTag()}"
    val tagged = copy(df = df.withColumn(cap,
      struct(col(GC.Label).as("label"), col(GC.Id).cast("bigint").as("id"))))
    branch(tagged).df.select(
      col(cap).getField("id").as(GC.Id),
      col(cap).getField("label").as(GC.Label)).distinct()
  }

  /** Gremlin `valueMap(keys...)`-style projection: (label, id, keys...)
    * — [[values]] keeping element identity. Labels whose schema lacks a
    * key contribute no rows (the `has()` convention). */
  def valueMap(keys: String*): DataFrame = {
    val want = Seq(GC.Label, GC.Id) ++ keys
    if (keys.toSet.subsetOf(df.columns.toSet)) df.select(want.map(col): _*)
    else {
      val parts = labels
        .filter(l => keys.toSet.subsetOf(graph.vertices(l).columns.toSet))
        .map { l =>
          graph.hydrate(df.where(col(GC.Label) === l).select(col(GC.Id), col(GC.Label)),
            GC.Id, l, keys).select(want.map(col): _*)
        }
      nonEmptyUnion2(parts,
        df.select(col(GC.Id), col(GC.Label)).where(lit(false))
          .select(Seq(col(GC.Label), col(GC.Id)) ++ keys.map(k => lit(null).as(k)): _*))
    }
  }

  /** Gremlin `as(name)`: label the current position so a later
    * [[select]] can jump back to it (or project it). The capture is a
    * `struct<label, id>` column that rides every subsequent expansion
    * alongside `_path` — per traverser, like the reference's inherited
    * TinkerPop path engine. Re-using a name overwrites the capture
    * (TinkerPop's last-wins convention). */
  def as(name: String): Step =
    copy(
      df = df.withColumn(s"$CapPrefix$name",
        struct(col(GC.Label).as("label"), col(GC.Id).cast("bigint").as("id"))),
      captures = captures + (name -> labels))

  /** Gremlin `select(name)`: move each traverser back to its capture.
    * Multiplicity is per-traverser (a customer captured before a 3-order
    * fan-out comes back 3 times — `dedup()` for set semantics). Carried
    * columns (`_path`, other captures) survive; edge-property columns
    * from the abandoned position do not. */
  def select(name: String): Step = {
    val cap = s"$CapPrefix$name"
    require(df.columns.contains(cap), s"""no as("$name") capture in scope""")
    val keepCarried = df.columns.filter(isCarried).toSeq.map(col)
    // Traversers without the capture (e.g. rows from a union branch
    // that never passed as(name) — null-filled by unionByName) are
    // DROPPED, matching Gremlin select semantics.
    copy(
      df = df.where(col(cap).isNotNull)
        .select(Seq(col(cap).getField("id").as(GC.Id),
          col(cap).getField("label").as(GC.Label)) ++ keepCarried: _*),
      labels = captures.getOrElse(name, graph.vertexLabels))
  }

  /** Gremlin `select(a, b, ...)` (terminal): one row per traverser, one
    * `struct<label, id>` column per named capture. Traversers missing
    * any requested capture are dropped (Gremlin semantics). */
  def select(first: String, second: String, rest: String*): DataFrame = {
    val names = first +: second +: rest
    names.foreach(n => require(df.columns.contains(s"$CapPrefix$n"),
      s"""no as("$n") capture in scope"""))
    df.where(names.map(n => col(s"$CapPrefix$n").isNotNull).reduce(_ && _))
      .select(names.map(n => col(s"$CapPrefix$n").as(n)): _*)
  }

  /** Gremlin `count()`. */
  def count(): Long = df.count()

  /** Gremlin `values(key).sum()/mean()/min()/max()` — property
    * aggregation terminals. The key hydrates per label like [[values]]
    * (labels lacking it contribute no rows), and multiplicity counts:
    * a vertex reached by three traversers contributes three times,
    * matching the inherited traverser semantics. */
  def sumValue(key: String): DataFrame =
    values(key).agg(sum(col(key)).as("sum"))
  def meanValue(key: String): DataFrame =
    values(key).agg(avg(col(key)).as("mean"))
  def minValue(key: String): DataFrame =
    values(key).agg(min(col(key)).as("min"))
  def maxValue(key: String): DataFrame =
    values(key).agg(max(col(key)).as("max"))

  /** Gremlin `groupCount()` by (label, id) over the frontier. */
  def groupCount(): DataFrame =
    df.groupBy(col(GC.Label), col(GC.Id))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("cnt"))

  /** Gremlin `group().by(key)` (terminal): frontier elements grouped by
    * a property value (hydrated if no longer carried), one row per key
    * with the sorted member list and its size. The member list
    * materializes per group — the Gremlin contract; for skew-safe
    * counting at corpus scale use [[groupCount]] or aggregate over
    * `toDF` instead. */
  def group(key: String): DataFrame =
    withKeyColumn(key).groupBy(col(key))
      .agg(
        sort_array(collect_list(
          struct(col(GC.Label).as("label"), col(GC.Id).cast("bigint").as("id"))))
          .as("members"),
        org.apache.spark.sql.functions.count(lit(1)).as("n"))

  /** Start recording traversal paths — Gremlin `path()` needs every step
    * from here on to carry its history. The path is a
    * `array<struct<label, id>>` column maintained by each expansion. */
  def withPath(): Step = copy(df = df.withColumn(PathCol,
    array(struct(col(GC.Label).as("label"), col(GC.Id).cast("bigint").as("id")))))

  /** Gremlin `withSack(init)`: attach a per-traverser accumulator that
    * rides every subsequent expansion/branch like `_path` and the
    * `as()` captures (the inherited sack machinery,
    * `pom.xml:19-27`). Splitting traversers (fan-out joins) COPY the
    * sack — TinkerPop's default splitOperator — and each copy then
    * accumulates independently. For exact aggregation downstream,
    * initialize with a DECIMAL (the q15 rule), not a float. */
  def withSack(init: Column): Step =
    copy(df = df.withColumn(Step.SackCol, init))

  /** Gremlin `sack(op).by(...)`: update each traverser's sack from its
    * current position — `f` receives the sack column and may reference
    * any frontier column (edge properties after `outE`/`inE`, vertex
    * properties still carried). One projection, codegen'd; no shuffle. */
  def modifySack(f: Column => Column): Step = {
    require(df.columns.contains(Step.SackCol), "call withSack() before modifySack()")
    copy(df = df.withColumn(Step.SackCol, f(col(Step.SackCol))))
  }

  /** Terminal Gremlin `sack()`: one row per traverser —
    * `(label, id, sack)`. */
  def sack(): DataFrame = {
    require(df.columns.contains(Step.SackCol), "call withSack() before sack()")
    df.select(col(GC.Label), col(GC.Id), col(Step.SackCol).as("sack"))
  }

  /** The recorded paths (call after `withPath()` + expansions):
    * one row per traverser, `path` = the visited (label, id) chain. */
  def paths(): DataFrame = {
    require(df.columns.contains(PathCol), "call withPath() before paths()")
    df.select(col(PathCol).as("path"))
  }

  /** Current frontier as (id, label[, eprops]) DataFrame. */
  def toDF: DataFrame = df

  private val PathCol = "_path"
  private val CapPrefix = "_as_"
  private def isCarried(c: String): Boolean =
    c == PathCol || c == Step.DepthCol || c == Step.SackCol ||
      c.startsWith(CapPrefix)

  /** Merge capture registries from parallel branches: when BOTH sides
    * registered the same name, the label sets UNION — last-wins (the
    * linear-chain `as()` rule) would under-approximate the frontier a
    * later select(name) can hold and silently drop label-pruned rows. */
  private def mergeCaptures(a: Map[String, Seq[String]],
      b: Map[String, Seq[String]]): Map[String, Seq[String]] =
    (a.keySet ++ b.keySet).map { k =>
      k -> (a.getOrElse(k, Nil) ++ b.getOrElse(k, Nil)).distinct.sorted
    }.toMap

  private def nonEmptyUnion(parts: Seq[DataFrame]): DataFrame =
    if (parts.isEmpty) df.where(lit(false)) // empty result, same schema
    else parts.reduce(_.unionByName(_))

  /** [[nonEmptyUnion]] with an explicit empty-case frame (for unions
    * whose schema differs from the step's own `df`). */
  private def nonEmptyUnion2(parts: Seq[DataFrame], empty: => DataFrame): DataFrame =
    if (parts.isEmpty) empty
    else parts.reduce(_.unionByName(_))
}

/** One projected field of [[Step.project]] — a Gremlin `by(subtraversal)`
  * modulator: run `branch` from each origin element and reduce its output
  * to ONE scalar. Build with the [[Projection$ companion]] constructors. */
final case class Projection private (
    name: String,
    branch: Step => Step,
    agg: Column => Column,
    key: Option[String],
    zeroFill: Boolean)

object Projection {
  import org.apache.spark.sql.functions.{count => fCount}

  /** `project(name).by(branch.count())`: the number of branch outputs
    * per origin element, 0 when the branch produces none. */
  def count(name: String)(branch: Step => Step): Projection =
    Projection(name, branch, fCount, None, zeroFill = true)

  /** `project(name).by(branch.values(key).agg(...))`: an aggregate
    * (max/min/sum/first...) of a property of the branch's landed
    * elements, hydrated per label; null when the branch produces none
    * (labels lacking the key contribute no rows — the has()
    * convention). */
  def agg(name: String, key: String, agg: Column => Column)(
      branch: Step => Step): Projection =
    Projection(name, branch, agg, Some(key), zeroFill = false)
}

object Step {
  /** Depth tag emitted by [[Step.repeatEmit]] — the Gremlin `loops()`
    * value of each emitted frontier row. Carried through subsequent
    * expansions (constant once emitted); a nested repeatEmit overwrites
    * it with its own depths. */
  val DepthCol = "_depth"

  /** Per-traverser sack accumulator column ([[Step.withSack]]). */
  val SackCol = "_sack"

  /** Unique suffix for internal origin captures — nested
    * optional/coalesce branches must not collide. Plan-construction
    * state only (never evaluated on executors). */
  private val branchTags = new java.util.concurrent.atomic.AtomicLong
  private def nextBranchTag(): Long = branchTags.incrementAndGet()
}
