package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, Cast, EqualTo, Expression, IsNotNull}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf

/** Referential-integrity join elimination — the optimizer-rule form of
  * [[graft.graph.PropertyGraph.traverseAll]]'s fast path.
  *
  * A traversal that expands from EVERY vertex of a label joins the edge
  * frame against the complete vertex-id list. Under referential
  * integrity that join is an identity filter, but Spark cannot know
  * that: at scale it plans a full shuffle or a giant broadcast of the
  * fact-side edge table. Warehouses solve this with trusted
  * (RELY/informational) constraints that license join elimination; this
  * rule is that mechanism for graft's per-label layout.
  *
  * TRUST CONTRACT — [[RiJoinElimination.declareForeignKey]] registers a
  * specific (edge-frame path, key column) -> (vertex-frame path, id
  * column) pair: every value of the edge key column exists (non-null)
  * in the vertex id column. The bulk loaders guarantee exactly this for
  * the frames they write. The rule then rewrites
  * `Join(edges, Project(id, vertexScan), Inner, edges.k == id)` into
  * `Project(edges.*, edges.k AS id)` — but ONLY when the left key
  * attribute provably originates from the declared FK column: the
  * provenance trace follows it down through operators that cannot
  * manufacture values outside the scanned column's domain (projections
  * and alias/cast chains, filters, sorts/limits, aggregation keys,
  * inner/semi joins, the null-safe sides of outer joins). Any operator
  * outside that whitelist — a union, a full outer join, an expression
  * that computes a new key — stops the trace and the join is kept. An
  * arbitrary session query joining non-FK ids against the vertex frame
  * is therefore NOT rewritten, preserving its dangling-key filtering.
  *
  * Declarations live in the SESSION conf (`spark.graft.ri.foreignKeys`),
  * so they are scoped per SparkSession — two sessions over the same
  * JVM see only their own contracts — and clone with the session state.
  *
  * Injection: config-time via [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions`), or [[RiJoinElimination.install]] on a live
  * session.
  */
object RiJoinElimination extends Rule[LogicalPlan] {

  /** Session-conf key holding the declared FK contracts: entries are
    * `edgePath\tkeyCol\tvertexPath\tidCol` joined by `;` (paths never
    * contain tabs or semicolons on supported filesystems). */
  val ConfKey = "spark.graft.ri.foreignKeys"

  private case class FkDecl(edgePath: String, keyCol: String,
    vertexPath: String, idCol: String)

  /** Declare the RI contract: every `edgeKeyCol` value in the frame at
    * `edgePath` exists non-null as `vertexIdCol` in the frame at
    * `vertexPath`. Session-scoped. */
  def declareForeignKey(spark: SparkSession, edgePath: String, edgeKeyCol: String,
      vertexPath: String, vertexIdCol: String): Unit = {
    val entry = Seq(normalize(edgePath), edgeKeyCol,
      normalize(vertexPath), vertexIdCol).mkString("\t")
    val cur = spark.conf.getOption(ConfKey).filter(_.nonEmpty)
    if (!cur.exists(_.split(";").contains(entry)))
      spark.conf.set(ConfKey, (cur.toSeq :+ entry).mkString(";"))
  }

  def clearDeclarations(spark: SparkSession): Unit = spark.conf.unset(ConfKey)

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  /** Parse declarations from the ACTIVE session's conf (SQLConf.get is
    * the per-session thread-local during optimization). */
  private def declarations: Seq[FkDecl] =
    SQLConf.get.getConfString(ConfKey, "").split(";").toSeq
      .map(_.split("\t", -1)).collect {
        case Array(ep, kc, vp, ic) => FkDecl(ep, kc, vp, ic)
      }

  private def normalize(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  /** Null-checks only? On a declared (non-null) id domain they are
    * identity filters the optimizer infers from the join condition. */
  private def isNotNullOnly(e: Expression): Boolean = e match {
    case IsNotNull(_) => true
    case And(l, r) => isNotNullOnly(l) && isNotNullOnly(r)
    case _ => false
  }

  private def underlyingAttr(e: Expression): Option[Attribute] = e match {
    case a: Attribute => Some(a)
    case Alias(c, _) => underlyingAttr(c)
    case Cast(c, _, _, _) => underlyingAttr(c)
    case _ => None
  }

  /** Root path of a parquet scan. */
  private def scanPath(plan: LogicalPlan): Option[String] = plan match {
    case r: LogicalRelation => r.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.headOption.map(p => normalize(p.toString))
      case _ => None
    }
    case _ => None
  }

  /** Is `plan` a bare projection of a declared vertex frame's id column?
    * Returns (projected attribute, vertex path, id column) when so.
    * Matches `Project(Alias(Cast?(id), _) | id,
    * [IsNotNull-Filter?] Scan(path))`. */
  private def completeIdDomain(plan: LogicalPlan,
      decls: Seq[FkDecl]): Option[(Attribute, String, String)] = plan match {
    case Project(Seq(one), child) =>
      val scan = child match {
        case r: LogicalRelation => Some(r)
        case Filter(cond, r: LogicalRelation) if isNotNullOnly(cond) => Some(r)
        case _ => None
      }
      for {
        rel <- scan
        path <- scanPath(rel)
        decl <- decls.find(_.vertexPath == path)
        u <- underlyingAttr(one)
        if u.name == decl.idCol
      } yield (one.toAttribute, path, decl.idCol)
    case _ => None
  }

  /** Provenance: trace `attr` down `plan` to its originating scan column
    * through value-preserving operators only. Returns (scan root path,
    * column name) when provable; None stops the rewrite. Every recursion
    * step must guarantee the attribute's value set is a subset of the
    * origin column's scanned values (no manufactured values, no
    * outer-join nulls). */
  private def origin(plan: LogicalPlan, attr: Attribute): Option[(String, String)] =
    plan match {
      case r: LogicalRelation if r.outputSet.contains(attr) =>
        scanPath(r).map(p => (p, attr.name))
      case p: Project =>
        p.projectList.find(_.toAttribute.exprId == attr.exprId)
          .flatMap(underlyingAttr).flatMap(origin(p.child, _))
      case a: Aggregate =>
        // only a passthrough grouping key: its values are a subset of input
        a.aggregateExpressions.find(_.toAttribute.exprId == attr.exprId)
          .flatMap(underlyingAttr)
          .filter(u => a.groupingExpressions.exists {
            case g: Attribute => g.exprId == u.exprId
            case _ => false
          })
          .flatMap(origin(a.child, _))
      case j: Join =>
        val fromLeft = j.left.outputSet.contains(attr)
        val fromRight = j.right.outputSet.contains(attr)
        val nullSafe = j.joinType match {
          case Inner | Cross | LeftSemi | LeftAnti => true
          case LeftOuter => fromLeft   // right side gains nulls
          case RightOuter => fromRight // left side gains nulls
          case _ => false
        }
        if (fromLeft && nullSafe) origin(j.left, attr)
        else if (fromRight && nullSafe) origin(j.right, attr)
        else None
      case g: Generate if g.requiredChildOutput.contains(attr) =>
        origin(g.child, attr) // passthrough side, not generator output
      case u @ (_: Filter | _: Sort | _: LocalLimit | _: GlobalLimit |
                _: SubqueryAlias | _: Repartition | _: RepartitionByExpression |
                _: Sample | _: Deduplicate | _: Window) =>
        val child = u.children.head
        if (child.outputSet.contains(attr)) origin(child, attr) else None
      case _ => None // unions, full outer joins, anything else: unprovable
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val decls = declarations
    if (decls.isEmpty) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(EqualTo(a: Attribute, b: Attribute)), _) =>
        completeIdDomain(right, decls) match {
          case Some((idAttr, vPath, vId)) =>
            // which side of the equality is the frontier id?
            val (edgeKey, frontierId) =
              if (b.exprId == idAttr.exprId) (a, b)
              else if (a.exprId == idAttr.exprId) (b, a)
              else (null, null)
            val fkProven = frontierId != null && left.outputSet.contains(edgeKey) &&
              origin(left, edgeKey).exists { case (ePath, eCol) =>
                decls.exists(d => d.edgePath == ePath && d.keyCol == eCol &&
                  d.vertexPath == vPath && d.idCol == vId)
              }
            if (!fkProven) j
            else
              // join eliminated: the frontier contributes only its id
              // column, which equals the edge key on every surviving row —
              // and the declared FK contract says every row survives
              Project(left.output :+ Alias(edgeKey, frontierId.name)(
                exprId = frontierId.exprId), left)
          case None => j
        }
    }
  }
}
