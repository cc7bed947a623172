package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration for graft's custom Catalyst
  * expressions, making them first-class SQL functions:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *   ...
  * spark.sql("SELECT vec_dot(a.embedding, b.embedding) FROM ...")
  * spark.sql("SELECT word_ngrams(split(text, ' '), 3) FROM docs")
  * }}}
  *
  * This is the (c)-level integration point of the extension ladder.
  * Two tiers are used: function injection (the SQL surface above) and
  * an optimizer `Rule[LogicalPlan]` ([[RewriteHofDot]]) that rewrites
  * the portable `aggregate(zip_with(...))` dot-product form into the
  * codegen'd [[VecDot]]. No custom SparkStrategy/SparkPlan: SURVEY §4 —
  * every operator's physical shape is already expressible through
  * Catalyst's planner, and a bespoke physical operator would forfeit
  * whole-stage codegen for no structural gain.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        new FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
        (children: Seq[Expression]) => {
          require(children.size == 2, "vec_dot(a, b) takes two array arguments")
          VecDot(children(0), children(1))
        }
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("word_ngrams"),
        new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
        (children: Seq[Expression]) => {
          require(children.size == 2, "word_ngrams(tokens, n) takes an array and a literal n")
          val n = children(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(s"word_ngrams n must be an integer literal, got $other")
          }
          WordNGrams(children(0), n)
        }
      )
    )
    // Rule[LogicalPlan] tier: HOF dot products execute as VecDot
    // (opt-out via spark.graft.rewriteHofDot=false — see RewriteHofDot
    // for the dense-vector precondition)
    ext.injectOptimizerRule(_ => RewriteHofDot)
  }
}
