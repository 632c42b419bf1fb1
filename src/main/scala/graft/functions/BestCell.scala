package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared rounding helper: Spark's `round(x, 9)` semantics for doubles
  * (HALF_UP over `BigDecimal.valueOf`, NaN/Infinity passed through) as a
  * static method callable from generated code — the exact arithmetic the
  * oracle replays, factored out so [[BestCellExpr]]'s loop and the
  * `round(...)` expression it replaces produce bit-identical values. */
object Rounding {
  def round9(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
}

/** Row-local argmax/argmin cell assignment against a DRIVER-COLLECTED
  * centroid grid — ONE codegen'd expression whose generated code size is
  * independent of k (a k × dims loop over a referenced constant matrix),
  * replacing both the broadcast-join + `max(struct)` agg form AND the
  * `array_max(array(struct...))` literal-unroll form (whose expression
  * tree grows with k: at the e117 derived k = 40 the unrolled tree
  * measured 1.3–1.6× SLOWER than the join it replaced, while this loop
  * form removes the corpus shuffle AND the per-candidate expression
  * overhead).
  *
  * Semantics are value-identical to
  * `max(struct(round(metric(emb, cv), 9), -cid))` over the same
  * centroids:
  *
  *  - cosine (`l2 = false`): sim = round9(dot(a,b) / (sqrt(dot(a,a)) *
  *    sqrt(dot(b,b)))) with every dot the sequential left fold in double
  *    precision ([[DotProductExpr]]'s arithmetic; the centroid-side
  *    norms are precomputed at construction with the same fold, so the
  *    IEEE sequence is unchanged). Output struct `(sim, ncid)`.
  *  - L2 (`l2 = true`): d = round9(dot(v,v) + dot(cv,cv) − 2·dot(v,cv)),
  *    output struct `(nd = −d, ncid)` — the PQ argmin as the same max.
  *
  * Comparison replicates Spark's struct ordering exactly:
  * `SQLOrderingUtil.compareDoubles` on the score (NaN greatest,
  * −0.0 == 0.0), a null score loses to any non-null, ties fall to the
  * larger ncid (= the smaller cid). A null or length-mismatched input
  * array yields `(null, −min cid)` — what the join form's all-null sim
  * column aggregated to. The float-vs-double element type of the input
  * and of the collected centroids is preserved (floats upcast per
  * element, exactly the joined fold's sequence). */
final case class BestCellExpr(child: Expression, cids: Array[Long],
    cents: Array[Array[Double]], l2: Boolean, carryInput: Boolean = false)
    extends UnaryExpression {

  require(cids.length == cents.length && cids.nonEmpty,
    s"need matching non-empty cids/cents, got ${cids.length}/${cents.length}")
  require(cents.forall(_.length == cents(0).length),
    "centroid rows must share dimensionality")

  private val dims = cents(0).length
  // centroid-side constants, precomputed with the sequential fold the
  // joined dot-product expression ran (identical IEEE sequence)
  private val selfDots: Array[Double] = cents.map { cv =>
    var acc = 0.0; var i = 0
    while (i < dims) { acc += cv(i) * cv(i); i += 1 }
    acc
  }
  private val norms: Array[Double] = selfDots.map(math.sqrt)
  private val minNcid: Long = -cids.min

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"best_cell requires an ARRAY<FLOAT|DOUBLE> input, got ${child.dataType.sql}")

  /** `carryInput` additionally passes the input array through as a
    * third field `emb` — the single-evaluation discipline: a consumer
    * that needs both the assignment AND the vector routes the struct
    * through one `explode(array(...))` generate barrier, so a non-cheap
    * child (e.g. the e109 whitening projection) is evaluated EXACTLY
    * once per row. Referencing the child column alongside this
    * expression in one projection instead lets the scan-side alias
    * substitution inline the child expression into both references —
    * measured as a 2× whiten re-evaluation per training round. */
  override def dataType: DataType = {
    val core = Seq(
      StructField(if (l2) "nd" else "sim", DoubleType, nullable = true),
      StructField("ncid", LongType, nullable = false))
    StructType(
      if (carryInput) core :+ StructField("emb", child.dataType, nullable = true)
      else core)
  }

  override def nullable: Boolean = false
  override def prettyName: String = "best_cell"

  private lazy val childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** The loop, shared verbatim by interpreted eval and the generated
    * code (one virtual call per row; the loop body JIT-compiles once,
    * independent of k). */
  def bestRow(a: ArrayData): InternalRow = {
    def out(score: Any, ncid: Long): InternalRow =
      new GenericInternalRow(
        if (carryInput) Array[Any](score, ncid, a) else Array[Any](score, ncid))
    if (a == null || a.numElements() != dims)
      return out(null, minNcid)
    val lf = childIsFloat
    var selfDot = 0.0
    var i = 0
    while (i < dims) {
      val v = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      selfDot += v * v
      i += 1
    }
    val na = math.sqrt(selfDot)
    var bestScore = 0.0
    var bestNull = true
    var bestNcid = 0L
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var dot = 0.0
      var d = 0
      while (d < dims) {
        val v = if (lf) a.getFloat(d).toDouble else a.getDouble(d)
        dot += v * cv(d)
        d += 1
      }
      val score =
        if (l2) -Rounding.round9(selfDot + selfDots(c) - 2.0 * dot)
        else Rounding.round9(dot / (na * norms(c)))
      val ncid = -cids(c)
      val better =
        if (bestNull) true
        else {
          val cmp = org.apache.spark.sql.catalyst.util.SQLOrderingUtil
            .compareDoubles(score, bestScore)
          cmp > 0 || (cmp == 0 && ncid > bestNcid)
        }
      if (better) { bestScore = score; bestNull = false; bestNcid = ncid }
      c += 1
    }
    out(if (bestNull) null else java.lang.Double.valueOf(bestScore), bestNcid)
  }

  override def eval(input: InternalRow): Any =
    bestRow(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bestCell", this, classOf[BestCellExpr].getName)
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        |${c.code}
        |org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
        |  $self.bestRow(${c.isNull} ? null : ${c.value});
      """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BestCellExpr =
    copy(child = newChild)
}
