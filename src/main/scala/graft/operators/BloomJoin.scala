package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}

import graft.functions.BloomFilterAggregator
import graft.plans.BloomMightContain

/** Bloom-prefiltered equi-join: build a Bloom filter over the (small)
  * build side's keys, probe it on the (huge) probe side BEFORE the join
  * shuffle, then run the real join. The explicit, library-level form of
  * Spark's `runtime.bloomFilter` rewrite — exposed so a pipeline can
  * apply it where the optimizer's heuristics won't (e.g. across a
  * snapshot boundary, or with a hand-tuned bit budget).
  *
  * Scale shape: the build is one scan + an OR-merge of bitset partials
  * (the shuffle carries bitsets, not keys); the probe is a codegen'd
  * map-side predicate, so the rows that die at the filter never enter
  * the join exchange. With a 1% dim selectivity, that is ~99% of the
  * fact shuffle gone. The bitset collect to the driver is `numBits/8`
  * bytes — a sketch, not data (same contract as the IVF centroid
  * collect).
  *
  * Correctness: Bloom filters admit false positives only, and the join
  * that follows removes them — the result is EXACTLY the plain join's,
  * which is what the oracle asserts.
  */
object BloomJoin {

  /** `fact ⋈ dim` on `fact(factKey) = dim(dimKey)`, with the fact side
    * Bloom-prefiltered. Keys must be integral (cast to long).
    */
  def prefilteredJoin(
      fact: DataFrame,
      factKey: Column,
      dim: DataFrame,
      dimKey: Column,
      numBits: Int = 1 << 16,
      numHashes: Int = 5
  ): DataFrame = {
    val spark = fact.sparkSession
    val bits = dim
      .select(dimKey.cast("long"))
      .as[Long](Encoders.scalaLong)
      .select(new BloomFilterAggregator(numBits, numHashes).toColumn)
      .head()
    import org.apache.spark.sql.graft.bridge
    val pred = bridge.column(BloomMightContain(bridge.expression(factKey.cast("long")), bits, numBits, numHashes))
    fact.filter(pred).join(dim, factKey === dimKey)
  }
}
