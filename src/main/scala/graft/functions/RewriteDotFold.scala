package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the composable dot-product fold
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x)`
  * into the allocation-free codegen'd [[DotProduct]].
  *
  * Users writing the idiomatic higher-order-function formulation get the
  * native fast path automatically; semantics are identical (same
  * ascending accumulation order, null-intolerant inputs). Only fires when
  * both arrays are `array<double>` without nullable elements — exactly
  * the shape `DotProduct` evaluates. Injected by [[GraftExtensions]]. */
object RewriteDotFold extends Rule[LogicalPlan] {

  private def isStrictDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), zipArgs, _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(acc: NamedLambdaVariable, elem: NamedLambdaVariable, _), mergeArgs, _),
        LambdaFunction(fin: NamedLambdaVariable, finArgs, _))
      if zipArgs.map(_.exprId) == Seq(x, y).map(_.exprId) &&
         mergeArgs.map(_.exprId) == Seq(acc, elem).map(_.exprId) &&
         finArgs.map(_.exprId) == Seq(fin).map(_.exprId) &&
         isStrictDoubleArray(a) && isStrictDoubleArray(b) =>
      DotProduct(a, b)
  }
}
