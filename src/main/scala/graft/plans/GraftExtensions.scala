package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.expressions.{ArrayAggregate, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.DotProduct

/** Optimizer rule: rewrite the canonical declarative dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)
  *
  * into the codegen'd [[graft.functions.DotProduct]] kernel. Users write
  * the idiomatic higher-order-function form; the engine runs the tight
  * loop. Semantics (left-fold order, null on length mismatch or null
  * element) are identical by construction, so the rewrite is always safe.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  private def isPair(l: Expression, r: Expression,
                     a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    (isVar(l, a) && isVar(r, b)) || (isVar(l, b) && isVar(r, a))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(mul: Multiply,
          Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(zero, DoubleType),
        LambdaFunction(add: Add,
          Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
      if zero == 0.0 &&
        isPair(mul.left, mul.right, x, y) &&
        isPair(add.left, add.right, acc, v) &&
        fin.exprId == fv.exprId =>
      DotProduct(a, b)
  }
}

/** SparkSessionExtensions entry point: registers the optimizer rewrite
  * and exposes the kernel as SQL function `vector_dot(a, b)`.
  *
  * Install via `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.vectorDotBuilder

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vector_dot"),
      vectorDotBuilder))
  }
}

object GraftExtensions {
  private val vectorDotBuilder: Seq[Expression] => Expression = children => {
    if (children.length != 2) throw new IllegalArgumentException(
      s"vector_dot requires exactly 2 arguments (array<double>, array<double>), got ${children.length}")
    DotProduct(children.head, children(1))
  }

  /** Install the same rule + SQL function on an EXISTING session —
    * `withExtensions` only takes effect on the first builder in a JVM,
    * so REPLs and shared test sessions need the post-hoc path.
    * Idempotent.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RewriteHofDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofDotProduct
    org.apache.spark.sql.graftbridge.FunctionBridge.register(
      spark, "vector_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "vector_dot"),
      vectorDotBuilder)
  }
}
