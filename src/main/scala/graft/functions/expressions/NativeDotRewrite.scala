package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: recognizes the canonical higher-order-function dot
  * product —
  *
  * {{{ aggregate(zip_with(transform(a, _.cast(double)),
  *                        transform(b, _.cast(double)), _ * _),
  *               0.0, _ + _) }}}
  *
  * — and replaces it with the native [[FloatDotProduct]] kernel
  * (identical result: same element order, same double promotion;
  * ~10× faster: HOFs evaluate interpreted per element).
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule`,
  * or at runtime through `spark.experimental.extraOptimizations`.
  * This is the (c)-tier extension point: user-facing declarative code
  * stays engine-agnostic while the optimizer swaps in the fast
  * kernel.
  */
object NativeDotRewrite extends Rule[LogicalPlan] {

  /** transform(arr, x -> cast(x as double)) over array<float> → arr.
    * Safe for any containsNull/length: [[FloatDotProduct]] yields
    * NULL on null elements and length mismatch, exactly like the HOF
    * fold it replaces. */
  private object FloatToDoubleTransform {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayTransform(base,
        LambdaFunction(Cast(v: NamedLambdaVariable, DoubleType, _, _),
          Seq(v2: NamedLambdaVariable), _))
        if v.exprId == v2.exprId &&
          base.dataType.isInstanceOf[ArrayType] &&
          base.dataType.asInstanceOf[ArrayType].elementType == FloatType =>
        Some(base)
      case _ => None
    }
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable,
      Seq(v2: NamedLambdaVariable), _) => v.exprId == v2.exprId
    case _ => false
  }

  private def isZeroDouble(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  private def isAdd(f: Expression): Boolean = f match {
    case LambdaFunction(Add(a: NamedLambdaVariable, b: NamedLambdaVariable, _),
      Seq(a2: NamedLambdaVariable, b2: NamedLambdaVariable), _) =>
      (a.exprId == a2.exprId && b.exprId == b2.exprId) ||
        (a.exprId == b2.exprId && b.exprId == a2.exprId)
    case _ => false
  }

  private def isMultiply(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(a: NamedLambdaVariable, b: NamedLambdaVariable, _),
      Seq(a2: NamedLambdaVariable, b2: NamedLambdaVariable), _) =>
      (a.exprId == a2.exprId && b.exprId == b2.exprId) ||
        (a.exprId == b2.exprId && b.exprId == a2.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
        ZipWith(FloatToDoubleTransform(a), FloatToDoubleTransform(b),
          mult),
        zero, merge, finish)
        if isMultiply(mult) && isZeroDouble(zero) && isAdd(merge) &&
          isIdentity(finish) =>
        FloatDotProduct(a, b)
    }
}
