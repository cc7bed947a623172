package graft.streaming

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** q407's two earned claims, asserted at the smallest tier:
  * the streaming serve is ROW-IDENTICAL to the one batch serve from
  * the same stored index (micro-batching invisible), and the
  * mid-stream compaction swap actually interleaved (two batches) —
  * i.e. at least one batch was served from the compacted files and
  * still matched.
  */
class StreamAnnServeSpec extends SparkSpec {

  test("streaming ANN serve: batch parity holds across the mid-stream compaction swap") {
    val out = graft.Queries.streamingAnnServe(spark, sfDir).collect()
    assert(out.nonEmpty)
    // every streamed (qid, rnk) matched the batch serve bit-for-bit
    assert(out.forall(_.getAs[Long]("eq_batch") == 1L))
    // the swap interleaved: the stream really ran as two micro-batches
    assert(out.forall(_.getAs[Long]("two_batches") == 1L))
    // k-bounded output: 3 rows per query, ranks complete per query
    val byQ = out.groupBy(_.getAs[Long]("qid"))
    assert(byQ.values.forall(rs => rs.map(_.getAs[Int]("rnk")).sorted.sameElements(1 to rs.length)))
  }

  test("streamed result is a full outer match of the batch serve (no missing, no extra rows)") {
    val streamed = graft.Queries.streamingAnnServe(spark, sfDir).select("qid", "rnk", "nid", "sim")
    val batch = graft.operators.Similarity
      .servedIvfPqTopK(
        graft.sources.Tables.parquet(spark, sfDir, "embeddings").filter(col("vec_id") < 50),
        col("vec_id"),
        col("embedding"),
        graft.operators.AnnIndex.appendedStored(spark, sfDir),
        nprobe = 4,
        k = 3
      )
      .select(col("qid"), col("rank").as("rnk"), col("nid"), col("sim"))
    assert(streamed.exceptAll(batch).isEmpty)
    assert(batch.exceptAll(streamed).isEmpty)
  }
}
