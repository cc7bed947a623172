package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** The STORED IVF-PQ index for the `embeddings` table under a data
  * dir — built once per dir (trained quantizers + the four persisted
  * index tables, see [[Similarity.buildIvfPqIndex]]) and shared by
  * every query that exercises the serving lifecycle: q272 audits the
  * stored probe against the in-memory one, q357 rewrites the
  * corpus-cardinality artifacts under an erasure request. Before this
  * object each consumer re-trained and re-wrote the whole index per
  * call; at 100 TB the index is built by one nightly job and mounted
  * read-only by every query cluster — this snapshot is that shape
  * in-process (the same rationale as [[CandidateGraph]]).
  */
object AnnIndex {
  private val cache = new ConcurrentHashMap[String, Similarity.IvfPqIndex]()

  /** Build-once per dir: nlist=16, m=16, ksub=16 — the q193/q272
    * hyperparameters, so the stored tables are the ones their oracles
    * already pin.
    */
  def stored(s: SparkSession, dir: String): Similarity.IvfPqIndex =
    cache.computeIfAbsent(
      dir,
      _ =>
        Similarity.buildIvfPqIndex(
          graft.sources.Tables.parquet(s, dir, "embeddings"),
          col("vec_id"),
          col("embedding"),
          nlist = 16,
          m = 16,
          ksub = 16,
          root = Scratch.dir("graft-annindex")
        )
    )
}
