package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash of a string's UTF-8 bytes:
  * `h = h * 1099511628211 + byte` (FNV-prime multiplier, wrap-around
  * arithmetic). The content-fingerprinting primitive for winnowing-style
  * document fingerprints.
  *
  * A native Catalyst `Expression` with `doGenCode` (preference order (b)
  * from the build brief: native expression > Scala UDF): the generated
  * code is a static call on the payload bytes, so it inlines into
  * whole-stage codegen with no boxing or serializer round-trip — the
  * difference matters when fingerprinting 100 TB of documents.
  */
final case class RollingHash64Expr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash64 requires STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash64Expr.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash64Expr.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64Expr =
    copy(child = newChild)
}

object RollingHash64Expr {
  final val Prime = 1099511628211L
  final val Seed = 1469598103934665603L

  /** Static hash kernel shared by interpreted eval and generated code. */
  def hash(bytes: Array[Byte]): Long = {
    var h = Seed
    var i = 0
    while (i < bytes.length) {
      h = h * Prime + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }
}
