package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Cast, EqualTo, Expression, IsNotNull}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
  * [[RiJoinElimination.declareVertexFrame]] registers a parquet-backed
  * vertex frame as an RI-complete id domain: every edge key referencing
  * it exists there and is non-null (the bulk loaders guarantee this).
  * The rule then rewrites
  * `Join(edges, Project(id, vertexScan), Inner, edges.k == id)` into
  * `Project(edges.* , edges.k AS id)` — the join is gone, and the
  * projected alias keeps the eliminated side's output attribute id so
  * upstream references stay valid.
  *
  * Injection: config-time via [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions`), or [[RiJoinElimination.install]] on a live
  * session.
  */
object RiJoinElimination extends Rule[LogicalPlan] {

  /** Root paths of parquet locations declared as RI-complete id
    * domains, each with its id column name. */
  private val declared = TrieMap.empty[String, String]

  def declareVertexFrame(path: String, idCol: String): Unit =
    declared.put(normalize(path), idCol)

  def clearDeclarations(): Unit = declared.clear()

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  private def normalize(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  /** Null-checks only? On a declared (non-null) id domain they are
    * identity filters the optimizer infers from the join condition. */
  private def isNotNullOnly(e: Expression): Boolean = e match {
    case IsNotNull(_) => true
    case And(l, r) => isNotNullOnly(l) && isNotNullOnly(r)
    case _ => false
  }

  /** Is `plan` a bare projection of a declared frame's id column?
    * Returns the projected attribute when so. Matches
    * `Project(Alias(Cast?(id), _) | id, [IsNotNull-Filter?] Scan(path))`. */
  private def completeIdDomain(plan: LogicalPlan): Option[Attribute] = plan match {
    case Project(Seq(one), child) =>
      val rel = child match {
        case r: LogicalRelation => Some(r)
        case Filter(cond, r: LogicalRelation) if isNotNullOnly(cond) => Some(r)
        case _ => None
      }
      val idCol = rel.flatMap(_.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.headOption
            .flatMap(p => declared.get(normalize(p.toString)))
        case _ => None
      })
      def underlying(e: Expression): Option[String] = e match {
        case a: AttributeReference => Some(a.name)
        case Cast(c, _, _, _) => underlying(c)
        case Alias(c, _) => underlying(c)
        case _ => None
      }
      idCol.flatMap { id =>
        if (underlying(one).contains(id)) Some(one.toAttribute) else None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(EqualTo(a: Attribute, b: Attribute)), _) =>
      completeIdDomain(right) match {
        case Some(idAttr) =>
          // which side of the equality is the frontier id?
          val (edgeKey, frontierId) =
            if (b.exprId == idAttr.exprId) (a, b)
            else if (a.exprId == idAttr.exprId) (b, a)
            else (null, null)
          if (frontierId == null || !left.outputSet.contains(edgeKey)) j
          else
            // join eliminated: the frontier contributes only its id
            // column, which equals the edge key on every surviving row —
            // and RI (declared) says every row survives
            Project(left.output :+ Alias(edgeKey, frontierId.name)(
              exprId = frontierId.exprId), left)
        case None => j
      }
  }
}
