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
  * This is the (c)-level integration point of the extension ladder —
  * the same hook a custom Rule[LogicalPlan] or SparkStrategy would use;
  * graft needs only function injection (SURVEY §4: Catalyst's built-in
  * rules already cover every optimization the reference hand-rolls).
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
  }
}
