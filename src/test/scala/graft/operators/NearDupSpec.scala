package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NearDupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.sources.Tables.parquet(spark, sfDir, "documents")

  test("jaccard pairs are symmetric-free (d1 < d2) and within (0, 1]") {
    val p = NearDup.jaccardPairs(docs, $"doc_id", $"text", threshold = 0.0)
    assert(p.filter($"d1" >= $"d2").count() === 0)
    assert(p.filter($"jaccard" <= 0 || $"jaccard" > 1).count() === 0)
  }

  test("identical docs have jaccard 1.0") {
    val d = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w v u")).toDF("doc_id", "text")
    val p = NearDup.jaccardPairs(d, $"doc_id", $"text", threshold = 0.5).collect()
    assert(p.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq === Seq((1L, 2L, 1.0)))
  }

  test("minhash LSH recall: finds nearly all true near-dup pairs (J >= 0.9)") {
    val truth = NearDup
      .jaccardPairs(docs, $"doc_id", $"text", threshold = 0.9)
      .select("d1", "d2")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val sigs = NearDup.minhashSignatures(docs, $"doc_id", $"text", k = 16)
    val cand = NearDup
      .lshCandidatePairs(sigs, bands = 4, rowsPerBand = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(truth.nonEmpty, "fixture should contain J>=0.9 near-dups")
    val recall = (truth & cand).size.toDouble / truth.size
    assert(recall >= 0.8, s"LSH recall $recall too low (truth=${truth.size}, cand=${cand.size})")
  }

  test("simhash: identical text → identical hash; hamming distance small for near-dups") {
    val d = Seq((1L, "spark flink trino duck"), (2L, "spark flink trino duck"), (3L, "completely different words entirely")).toDF("doc_id", "text")
    val h = NearDup.simhash32(d, $"doc_id", $"text").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) === h(2L))
    assert(h(1L) !== h(3L))
  }

  test("simhash pigeonhole candidates recover EXACTLY the all-pairs hamming answer") {
    val sample = docs.limit(150)
    val viaBuckets = NearDup
      .simhashNearDupPairs(sample, $"doc_id", $"text", maxHamming = 3)
      .select("d1", "d2", "hamming")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    val sigs = NearDup.simhash32(sample, $"doc_id", $"text")
    val brute = sigs
      .as("a")
      .join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("d1"),
        col("b.doc_id").as("d2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming")
      )
      .filter(col("hamming") <= 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(viaBuckets === brute, "pigeonhole recall must be exact, not probabilistic")
  }

  test("per-row signatures equal the aggregated signature table value for value") {
    // the q203 streaming path depends on this equivalence: the
    // stateless array-min form must reproduce the groupBy-min form
    val sh = NearDup.shingleTable(docs, $"doc_id", $"text", n = 3)
    val agg = NearDup
      .minhashSignaturesFromShingles(sh, k = 16)
      .collect()
      .map(r => r.getLong(0) -> (1 to 16).map(i => r.getLong(i)).toSeq)
      .toMap
    val perRow = NearDup
      .rowSignatures(
        docs.select(
          $"doc_id",
          array_distinct(graft.functions.TextOps.wordShingles(graft.functions.TextOps.tokens($"text"), 3)).as("shs")
        ).filter(size($"shs") >= 1),
        $"shs",
        k = 16
      )
      .drop("shs")
      .collect()
      .map(r => r.getLong(0) -> (1 to 16).map(i => r.getLong(i)).toSeq)
      .toMap
    assert(perRow === agg)
  }
}
