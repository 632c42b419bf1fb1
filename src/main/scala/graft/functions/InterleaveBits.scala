package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order curve key: the bits of two 32-bit ints interleaved into one
  * 64-bit long (x takes the even bit positions, y the odd). Rows sorted
  * by this key cluster along BOTH dimensions at once, which is what
  * turns Parquet row-group min/max stats into a 2-D box filter — the
  * multi-dimensional file-skipping layout (the technique behind
  * Delta/Iceberg Z-ORDER clustering; Morton, 1966).
  *
  * Inputs are the raw int values: interleaving is only meaningful when
  * both dimensions are comparably scaled, so callers normalize first
  * where needed (rank/bucket ids, not raw skewed values —
  * [[graft.operators.Layout.zorderBy]] documents the contract). Ints
  * are flipped to an unsigned-ordered space (`x ^ Int.MinValue`) before
  * interleaving so negative values sort before positive ones in the
  * z-space, matching SQL integer order.
  *
  * Native `doGenCode` expression (the (b) preference): one static call,
  * stays inside whole-stage codegen — this runs once per row in a
  * 100-TB layout rewrite, exactly where UDF boxing would hurt.
  */
final case class InterleaveBitsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"interleave_bits requires (INT, INT), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    InterleaveBitsExpr.interleave(x.asInstanceOf[Int], y.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.InterleaveBitsExpr.interleave($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBitsExpr =
    copy(left = newLeft, right = newRight)
}

object InterleaveBitsExpr {

  /** Spread the low 32 bits of `v` to the even bit positions of a long
    * (the classic Morton magic-number spread). */
  def spread(v: Int): Long = {
    var x = v.toLong & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Static kernel shared by interpreted eval and generated code.
    * Sign-flips both inputs so z-order agrees with SQL int order. */
  def interleave(x: Int, y: Int): Long =
    spread(x ^ Int.MinValue) | (spread(y ^ Int.MinValue) << 1)
}
