package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration of the engine's native Catalyst expressions,
  * so `spark.sql("SELECT rolling_hash64(text) ...")` works alongside the
  * Column API.
  *
  * Two entry points, same registrations:
  *  - [[GraftExtensions]] for config-time injection
  *    (`spark.sql.extensions=graft.functions.GraftExtensions`) — the
  *    standard extension-library path;
  *  - [[GraftFunctions.register]] for an already-running session (tests,
  *    notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.RiJoinElimination)
  }
}

object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  val all: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("rolling_hash64",
      new ExpressionInfo(classOf[RollingHash64Expr].getName, "rolling_hash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "rolling_hash64(str) takes one argument")
        RollingHash64Expr(args.head)
      }),
    ("dot_product",
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(a, b) takes two arguments")
        DotProductExpr(args(0), args(1))
      }),
    ("char_entropy8",
      new ExpressionInfo(classOf[CharEntropy8Expr].getName, "char_entropy8"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "char_entropy8(str) takes one argument")
        CharEntropy8Expr(args.head)
      }),
    ("mul_add_wrap",
      new ExpressionInfo(classOf[MulAddWrapExpr].getName, "mul_add_wrap"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "mul_add_wrap(x, a, b) takes three arguments")
        def lit(e: Expression): Long = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
          case other => throw new IllegalArgumentException(
            s"mul_add_wrap multiplier/addend must be integer literals, got $other")
        }
        MulAddWrapExpr(args(0), lit(args(1)), lit(args(2)))
      }))

  /** Register on a live session (idempotent: re-registration overwrites). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      org.apache.spark.sql.GraftSqlShims.registerFunction(spark, name, info, builder)
    }
}
