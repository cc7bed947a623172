package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

import graft.plans.BloomHash

/** Distributed Bloom-filter build: a typed `Aggregator` whose buffer is
  * the bitset itself. `reduce` sets the key's bits, `merge` is bitwise
  * OR — associative and commutative, so partial bitsets combine
  * map-side and the shuffle carries `numBits/8` bytes per partition,
  * never the keys. Building the filter over a dimension costs one scan
  * + one tiny exchange; the finished bitset is the broadcast operand of
  * [[graft.plans.BloomMightContain]].
  *
  * Hashing is [[BloomHash]] — shared with the probe expression, fully
  * deterministic (no seed, no RNG), so build and probe agree bit-for-bit
  * on every executor.
  */
class BloomFilterAggregator(numBits: Int, numHashes: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  require(numBits > 0 && (numBits & 63) == 0, s"numBits must be a positive multiple of 64, got $numBits")

  override def zero: Array[Long] = new Array[Long](numBits >>> 6)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    val a = BloomHash.h1(key)
    val b = BloomHash.h2(key)
    var i = 0
    while (i < numHashes) {
      val idx = BloomHash.bitIndex(a, b, i, numBits)
      buf(idx >>> 6) |= 1L << (idx & 63)
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
