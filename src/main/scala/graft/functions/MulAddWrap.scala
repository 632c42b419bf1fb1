package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `a * x + b` with 64-bit WRAPAROUND semantics — the universal-hash
  * permutation primitive (Carter–Wegman multiply-add family) used to
  * derive k MinHash components from one base hash. Spark's `*`/`+`
  * throw on overflow under ANSI mode (the session default), so the
  * wrap-around form needs a native expression; the generated code is a
  * single Java long multiply-add that inlines into whole-stage codegen.
  * The DuckDB oracle twin computes the identical value as
  * `(a * x + b) mod 2^64` in HUGEINT, re-signed into BIGINT.
  */
final case class MulAddWrapExpr(child: Expression, a: Long, b: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mul_add_wrap requires BIGINT input, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "mul_add_wrap"

  override protected def nullSafeEval(input: Any): Any =
    a * input.asInstanceOf[Long] + b // JVM long arithmetic wraps

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(${a}L * $c + ${b}L)")

  override protected def withNewChildInternal(newChild: Expression): MulAddWrapExpr =
    copy(child = newChild)
}
