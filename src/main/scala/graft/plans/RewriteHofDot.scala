package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply, NamedExpression, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rewrite: the declarative higher-order-function dot
  * product —
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0d, (acc, v) -> acc + v) }}}
  *
  * — becomes the codegen'd [[VecDot]] expression. Spark's higher-order
  * functions are `CodegenFallback`: each pair evaluation interprets the
  * lambda and allocates the zipped intermediate array, ~10× slower on
  * the all-pairs scoring path (measured in PlanSpec/VecDot docs). With
  * this rule a user writes the portable HOF form and still executes the
  * tight fused loop.
  *
  * Semantics note (why this is opt-in): the rewrite assumes DENSE,
  * EQUAL-LENGTH vectors — the embedding-column contract. On ragged
  * inputs the HOF form yields NULL (zip_with pads, null poisons the
  * sum) while VecDot truncates to the shorter length. Guard:
  * `spark.graft.rewriteHofDot=false` disables the rule per session;
  * registering [[GraftExtensions]] at all is the opt-in.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule` — the
  * Rule[LogicalPlan] tier of the extension ladder (the only tier the
  * parity surface didn't already need; SURVEY §4).
  */
object RewriteHofDot extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.rewriteHofDot"

  private def sameVar(e: Expression, declared: NamedExpression): Boolean = (e, declared) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) => a.exprId == b.exprId
    case _ => false
  }

  /** The lambda body reads `declared` (possibly via an up-cast to
    * double — analysis inserts it for float elements).
    */
  private def varAsDouble(e: Expression, declared: NamedExpression): Boolean = e match {
    case c: Cast if c.dataType == DoubleType => sameVar(c.child, declared)
    case other => sameVar(other, declared)
  }

  private def numericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(ConfKey, "true") != "true") plan
    else
      plan.transformAllExpressions {
        case ArrayAggregate(
              ZipWith(a, b, LambdaFunction(m: Multiply, Seq(x, y), _)),
              Literal(0.0, DoubleType),
              LambdaFunction(s: Add, Seq(acc, v), _),
              LambdaFunction(fin, Seq(fv), _)
            )
            if varAsDouble(m.left, x) && varAsDouble(m.right, y) &&
              sameVar(s.left, acc) && sameVar(s.right, v) &&
              sameVar(fin, fv) &&
              numericArray(a) && numericArray(b) =>
          VecDot(a, b)
      }
}
