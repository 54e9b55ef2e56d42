package graft.plans

import graft.functions.FloatVecDot
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the portable HOF dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS
  * DOUBLE)), 0D, (s, x) -> s + x) }}}
  *
  * over two `array<float>` columns into the codegen'd [[FloatVecDot]].
  * This is the (b)-tier of SURVEY §2's custom-operator ladder delivered
  * through the (idiomatic) extension point Spark provides for it: users
  * write the engine-portable HOF formulation, the optimizer swaps in the
  * native expression — the same pattern as Catalyst's own
  * `OptimizeJsonExprs`. Registered by [[graft.GraftExtensions]]
  * (`injectOptimizerRule`) and usable ad hoc through
  * `spark.experimental.extraOptimizations`.
  *
  * Soundness: the rewrite fires only when
  *  - both zip_with inputs are `array<float>`,
  *  - both lambda variables are cast to DOUBLE before the multiply (a
  *    float-precision multiply rounds differently and is NOT rewritten),
  *  - the zero is literal 0D, the merge is a plain `s + x` in either
  *    argument order, and the finish is the identity lambda.
  * [[FloatVecDot]] replicates the HOF's null semantics (length mismatch
  * or null element → NULL), so the rewrite is exact on EVERY input, not
  * just clean fixtures.
  */
object RewriteHofVecDot extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isDoubleCastOf(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case c: Cast =>
        c.dataType == DoubleType && (c.child match {
          case nv: NamedLambdaVariable => nv.exprId == v.exprId
          case _ => false
        })
      case _ => false
    }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(mul: Multiply,
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(add: Add,
              Seq(s: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
          if zero == 0.0d &&
            isFloatArray(a) && isFloatArray(b) &&
            ((isDoubleCastOf(mul.left, x) && isDoubleCastOf(mul.right, y)) ||
              (isDoubleCastOf(mul.left, y) && isDoubleCastOf(mul.right, x))) &&
            ((isVar(add.left, s) && isVar(add.right, el)) ||
              (isVar(add.left, el) && isVar(add.right, s))) &&
            isVar(fin, fv) =>
        FloatVecDot(a, b)
    }
}
