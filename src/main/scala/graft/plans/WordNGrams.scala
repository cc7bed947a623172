package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams over an `array<string>` token column, as a native
  * codegen'd expression.
  *
  * The composable formulation — `transform(sequence(...), i ->
  * concat_ws(' ', element_at(ws,i)...))` — is a HigherOrderFunction
  * chain: CodegenFallback, a lambda interpretation per shingle, an
  * allocation per element access. On the 5000-doc/260k-shingle bench
  * the explode alone took ~10 s; this loop takes ~1 s. Values are
  * identical: space-joined consecutive tokens, empty array when the doc
  * has fewer than n tokens.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val count = arr.numElements() - (n - 1)
    if (count <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(space, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", space, classOf[UTF8String].getName)
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val count = ctx.freshName("count")
        val out = ctx.freshName("out")
        val parts = ctx.freshName("parts")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        s"""
           |int $count = $a.numElements() - ${n - 1};
           |if ($count <= 0) {
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
           |} else {
           |  Object[] $out = new Object[$count];
           |  for (int $i = 0; $i < $count; $i++) {
           |    org.apache.spark.unsafe.types.UTF8String[] $parts = new org.apache.spark.unsafe.types.UTF8String[$n];
           |    for (int $j = 0; $j < $n; $j++) { $parts[$j] = $a.getUTF8String($i + $j); }
           |    $out[$i] = org.apache.spark.unsafe.types.UTF8String.concatWs($sepRef, $parts);
           |  }
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |}
         """.stripMargin
      }
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}
