package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.NearDup

class MinHashSigAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator signature == column-wise minhashSignatures, any partitioning") {
    val docs = graft.sources.Tables.parquet(spark, sfDir, "documents")
    val k = 8
    val colWise = NearDup
      .minhashSignatures(docs, $"doc_id", $"text", k = k)
      .collect()
      .map(r => r.getLong(0) -> (1 to k).map(i => r.getLong(i)).toSeq)
      .toMap
    val mh = udaf(new MinHashSigAggregator(k))
    val typed = NearDup
      .shingleTable(docs, $"doc_id", $"text", 3)
      .repartition(13) // force partial/merge path
      .select($"doc_id", TextOps.hash32($"g").as("x"))
      .groupBy("doc_id")
      .agg(mh($"x").as("sig"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq)
      .toMap
    assert(typed === colWise)
  }
}
