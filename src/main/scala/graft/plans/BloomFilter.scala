package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Deterministic Bloom-filter hashing shared by the build side
  * ([[graft.functions.BloomFilterAggregator]]) and the probe side
  * ([[BloomMightContain]]): splitmix64 finalizers + double hashing
  * (`g_i = h1 + i·h2`), pure integer arithmetic with no seed state, so
  * the same key sets the same bits on every executor, every run.
  */
object BloomHash {

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def h1(key: Long): Long = mix(key)

  /** Odd second hash so the double-hash probe sequence cycles the full
    * bit space.
    */
  def h2(key: Long): Long = mix(key ^ 0x5DEECE66DL) | 1L

  /** i-th probe bit index in [0, numBits). */
  def bitIndex(a: Long, b: Long, i: Int, numBits: Int): Int =
    (((a + i * b) & Long.MaxValue) % numBits).toInt
}

/** `might_contain(key)` against a Bloom bitset built by
  * [[graft.functions.BloomFilterAggregator]] — the probe side of a
  * semi-join runtime filter.
  *
  * Why this exists: pre-filtering a 100 TB fact table against a
  * dimension key set BEFORE the join shuffle is the single biggest
  * shuffle reducer in star-schema work (Spark's own
  * `runtime.bloomFilter` optimization is this move, made implicit; its
  * probe expression is `private[sql]`, so the library-level surface is
  * re-expressed here). The bitset rides the plan as ONE referenced
  * object (`ctx.addReferenceObj` — same pattern as [[NearestCells]]):
  * serialized once per plan into the broadcast task binary, never a
  * per-row literal, and the generated code is a single call whose probe
  * loop JITs to shifts and masks. False positives pass (the real join
  * removes them); false negatives cannot occur, so the filtered join
  * equals the unfiltered join exactly.
  */
case class BloomMightContain(child: Expression, bits: Array[Long], numBits: Int, numHashes: Int)
    extends UnaryExpression {

  require(numBits > 0 && (numBits & 63) == 0, s"numBits must be a positive multiple of 64, got $numBits")
  require(bits.length == numBits >>> 6, s"bitset of ${bits.length} words != numBits/64 = ${numBits >>> 6}")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"BloomMightContain requires BIGINT input, got $other")
    }

  def mightContain(key: Long): Boolean = {
    val a = BloomHash.h1(key)
    val b = BloomHash.h2(key)
    var i = 0
    while (i < numHashes) {
      val idx = BloomHash.bitIndex(a, b, i, numBits)
      if ((bits(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override def nullSafeEval(input: Any): Any = mightContain(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bloomMightContain", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.mightContain($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}
