package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization over a string column.
  *
  * Real multilingual corpora carry the same grapheme in composed
  * (U+00E9 "é") and decomposed (U+0065 U+0301 "e"+◌́) byte forms;
  * every byte-keyed operator downstream — exact dedup, MinHash
  * shingles, vocabulary joins, collation keys — silently treats them
  * as distinct unless the text is normalized FIRST. Spark exposes no
  * normalization function, so this is the "custom Catalyst Expression
  * beats UDF" rung ([[VecDot]]): a codegen'd call into the JDK's
  * `java.text.Normalizer` (Unicode-conformant NFC, the same
  * normalization DuckDB's `nfc_normalize` implements — the oracle
  * counterpart), with an ASCII fast path that returns the input
  * UTF8String untouched (NFC is the identity on ASCII, and at 100 TB
  * the overwhelmingly-ASCII corpus should pay one byte scan, not a
  * String round-trip, per row).
  *
  * NFC only — deliberately NOT NFKC: compatibility folding (fullwidth
  * → halfwidth, ligature expansion) is lossy and changes token counts;
  * canonical composition is the safe default before dedup/joins.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"NfcNormalize requires a string input, got ${child.dataType}"
      )

  /** NFC with the ASCII identity fast path; called from both the
    * interpreted and the generated paths so they cannot diverge.
    */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      // quick-check avoids allocating for already-composed non-ASCII text
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }
  }

  override def nullSafeEval(input: Any): Any = nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nfcNormalize", this, classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.nfc($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
