package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

import graft.operators.NearDup

/** Typed `Aggregator` computing a k-wide MinHash signature over a group
  * of pre-hashed shingles — the engine's custom-aggregate (UDAF)
  * surface (SURVEY §2.9 U3: the reference passes custom aggregate fns
  * to `agg`, `app.py:522-524`; here the generic capability).
  *
  * Buffer = k running minima; `merge` is elementwise min, so the
  * aggregation is associative/commutative and Spark's two-phase
  * (partial → shuffle → final) execution gives identical results at any
  * partitioning — signatures of a 100 TB corpus combine map-side.
  *
  * Matches the column-wise formulation in
  * [[NearDup.minhashSignatures]] value-for-value (same
  * [[NearDup.minhashParams]] constants).
  */
class MinHashSigAggregator(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  private val as: Array[Long] = NearDup.minhashParams(k).map(_._1).toArray
  private val bs: Array[Long] = NearDup.minhashParams(k).map(_._2).toArray

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = (as(i) * x + bs(i)) % NearDup.MinhashPrime
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
