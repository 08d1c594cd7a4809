package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.ArrayFloatDot

/** Optimizer rule: fuse the composable float-array dot-product pattern
  *
  *   `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *              0D, (acc, v) -> acc + v)`
  *
  * into the whole-stage-codegen'd [[ArrayFloatDot]] — the declarative
  * HOF spelling runs as interpreted lambda invocations (~50× slower on
  * pair-join hot paths). Semantics-preserving for ALL inputs:
  * ArrayFloatDot mirrors the HOF's null behavior (length mismatch /
  * null element → null), and the accumulation is the same sequential
  * widened-multiply-add.
  *
  * This is the engine's `Rule[LogicalPlan]` extension-point showcase:
  * registered through [[graft.GraftExtensions]]
  * (`injectOptimizerRule`), so ANY user writing the natural HOF
  * formulation — including generated SQL — gets the fast expression
  * without knowing `array_dot` exists.
  */
object DotProductFusion extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isDoubleCastOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case Cast(x: NamedLambdaVariable, DoubleType, _, _) => x.exprId == v.exprId
    case _ => false
  }

  private def refersTo(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case x: NamedLambdaVariable => x.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(mx, my, _),
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(al, ar, _),
          Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
      if isFloatArray(a) && isFloatArray(b)
        && ((isDoubleCastOf(mx, x) && isDoubleCastOf(my, y))
          || (isDoubleCastOf(mx, y) && isDoubleCastOf(my, x)))
        && ((refersTo(al, acc) && refersTo(ar, v))
          || (refersTo(al, v) && refersTo(ar, acc)))
        && refersTo(fin, fv) =>
      ArrayFloatDot(a, b)
  }
}
