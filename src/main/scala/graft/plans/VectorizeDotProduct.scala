package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProductExpr

/** Optimizer rule (the build contract's `Rule[LogicalPlan]` extension
  * point): rewrites the declarative dot-product spelling
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x)
  *
  * into the native codegen [[DotProductExpr]]. The declarative form is what
  * users naturally write with `org.apache.spark.sql.functions` — and it runs
  * on the CodegenFallback interpreter, allocating an intermediate array per
  * row. After this rule, any query using that spelling (including SQL text)
  * gets the fused primitive loop automatically: the optimizer, not the
  * query author, owns the kernel choice.
  *
  * The rewrite fires only on the exact shape with DOUBLE arrays, a 0.0 zero,
  * and no `finish` lambda — both sides accumulate left-to-right in ascending
  * index order, so results are bit-identical, not approximately equal
  * (asserted in PlansSpec). Registered via [[graft.GraftExtensions]]
  * (`injectOptimizerRule`).
  */
object VectorizeDotProduct extends Rule[LogicalPlan] {

  /** Register on a live session (idempotent). Cluster deploys get the rule
    * from `spark.sql.extensions=graft.GraftExtensions` instead. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq this))
      spark.experimental.extraOptimizations = cur :+ this
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
                Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
              Seq(lacc: NamedLambdaVariable, lv: NamedLambdaVariable), _),
            finish)
          if agg.resolved && isDoubleArray(a) && isDoubleArray(b) &&
            x.exprId == lx.exprId && y.exprId == ly.exprId &&
            acc.exprId == lacc.exprId && v.exprId == lv.exprId &&
            isIdentityFinish(finish) =>
        DotProductExpr(a, b)
    }

  /** aggregate()'s 3-arg form desugars to an identity finish lambda. */
  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }
}
