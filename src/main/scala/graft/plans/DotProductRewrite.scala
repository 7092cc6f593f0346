package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the idiomatic higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)
  *
  * into graft's codegen'd [[DotProduct]] primitive. Higher-order
  * functions evaluate interpreted and allocate an intermediate array per
  * row; on similarity workloads (all-pairs cosine) the rewrite is ~10x.
  * Summation order is identical (sequential left-to-right), so the
  * rewrite is bit-exact — a pure physical optimization.
  *
  * Injected via [[graft.functions.GraftExtensions]]
  * (spark.sql.extensions), so any user writing the declarative form
  * gets the fast kernel without knowing it exists.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case Cast(Literal(0.0, DoubleType), DoubleType, _, _) => true
    case _ => false
  }

  /** Matches (x, y) -> x * y over the two zipped lambda variables. */
  private def isPairwiseMultiply(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (x.exprId == a.exprId && y.exprId == b.exprId) ||
        (x.exprId == b.exprId && y.exprId == a.exprId)
    case _ => false
  }

  /** Matches (acc, v) -> acc + v. */
  private def isSum(f: Expression): Boolean = f match {
    case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (x.exprId == a.exprId && y.exprId == b.exprId) ||
        (x.exprId == b.exprId && y.exprId == a.exprId)
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // identity finish lambda may or may not be present depending on
      // how the aggregate was constructed
      case agg @ ArrayAggregate(ZipWith(a, b, mul), zero, merge, finish)
          if isZero(zero) && isPairwiseMultiply(mul) && isSum(merge) &&
            isDoubleArray(a) && isDoubleArray(b) && isIdentityFinish(finish) &&
            agg.resolved =>
        DotProduct(a, b)
    }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }
}
