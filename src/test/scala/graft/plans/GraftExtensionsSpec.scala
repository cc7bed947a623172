package graft.plans

import graft.SparkSpec

/** SQL-surface registration of the custom expressions. The shared test
  * session isn't built with extensions, so register into its function
  * registry through the same builder functions the extension injects.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("vec_dot and word_ngrams callable from SQL after injection") {
    // simulate injectFunction on an existing session
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "word_ngrams",
      exprs =>
        WordNGrams(
          exprs(0),
          exprs(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal].value.asInstanceOf[Int]
        ),
      "built-in"
    )
    val dot = spark.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head.getDouble(0)
    assert(dot === 11.0)
    val grams = spark.sql("SELECT word_ngrams(split('a b c d', ' '), 3) AS g").head.getSeq[String](0)
    assert(grams === Seq("a b c", "b c d"))
  }

  test("fresh session built withExtensions resolves the functions") {
    val s2 = org.apache.spark.sql.SparkSession
      .builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val d = s2.sql("SELECT vec_dot(array(CAST(2.0 AS FLOAT)), array(CAST(5.0 AS FLOAT)))").head.getDouble(0)
      assert(d === 10.0)
    } finally s2.stop()
  }

  test("optimizer rule rewrites HOF dot product into VecDot (and honors the opt-out)") {
    val s2 = org.apache.spark.sql.SparkSession
      .builder()
      .master("local[2]")
      .appName("graft-rule-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import org.apache.spark.sql.functions._
      // parquet-backed so ConvertToLocalRelation can't pre-evaluate the plan
      def hof = s2.read
        .parquet(s"$sfDir/embeddings.parquet")
        .limit(20)
        .select(graft.functions.VectorOps.dotHof(col("embedding"), col("embedding")).as("d"))
      val optimized = hof.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("vecdot"), s"rule did not fire:\n$optimized")
      // rewritten results == the native VecDot form
      val native = s2.read
        .parquet(s"$sfDir/embeddings.parquet")
        .limit(20)
        .select(graft.functions.VectorOps.dot(col("embedding"), col("embedding")).as("d"))
        .collect()
        .map(_.getDouble(0))
        .toSeq
      assert(hof.collect().map(_.getDouble(0)).toSeq === native)
      // opt-out: same query keeps the interpreted HOF form
      s2.conf.set("spark.graft.rewriteHofDot", "false")
      try {
        val off = hof.queryExecution.optimizedPlan.toString
        assert(!off.toLowerCase.contains("vecdot"), s"opt-out ignored:\n$off")
        assert(hof.collect().map(_.getDouble(0)).toSeq === native)
      } finally s2.conf.set("spark.graft.rewriteHofDot", "true")
    } finally s2.stop()
  }
}
