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
          root = Scratch.pinned("graft-annindex")
        )
    )

  /** The erasure cohort every consumer of [[erasedStored]] agrees on —
    * vec_id ≡ 0 mod 20, the deterministic stand-in for the request
    * list (q220's convention applied to the vector corpus).
    */
  def notErased(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = c % 20 =!= 0

  /** [[stored]]'s ERASED twin: the cohort tombstoned out of the two
    * corpus-cardinality artifacts (corpus_cells, pq_codes) by an
    * anti-filter rewrite through the retrying sink — the per-request
    * cost at 100 TB. Centroids/codebooks pass through unchanged: they
    * are dimension-sized MODEL parameters (k-means means over the
    * corpus), not per-subject rows — the same boundary DP-SGD draws;
    * erasure never retrains.
    */
  def erasedStored(s: SparkSession, dir: String): Similarity.IvfPqIndexPaths =
    erasedCache.computeIfAbsent(
      dir,
      _ => {
        val v1 = stored(s, dir).paths
        val v2 = Similarity.IvfPqIndexPaths(Scratch.pinned("graft-annindex-erased"))
        graft.sinks.RetryingSink.overwriteParquet(s.read.parquet(v1.centroids), v2.centroids)
        graft.sinks.RetryingSink.overwriteParquet(s.read.parquet(v1.codebooks), v2.codebooks)
        graft.sinks.RetryingSink.overwriteParquet(
          s.read.parquet(v1.corpusCells).filter(notErased(col("nid"))),
          v2.corpusCells
        )
        graft.sinks.RetryingSink.overwriteParquet(
          s.read.parquet(v1.pqCodes).filter(notErased(col("nid"))),
          v2.pqCodes
        )
        v2
      }
    )

  private val erasedCache = new ConcurrentHashMap[String, Similarity.IvfPqIndexPaths]()

  /** The delta-ingest batch every consumer of [[appendedStored]]
    * agrees on — vec_id ≡ 7 mod 10, the deterministic stand-in for
    * today's new embeddings (disjoint from the erasure cohort's
    * ≡ 0 mod 20 so the two lifecycle verbs stay independent).
    */
  def isNewBatch(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = c % 10 === 7

  /** The v1 index for the APPEND lifecycle: trained and built on the
    * OLD corpus only (everything outside [[isNewBatch]]) — the state
    * of the store the morning before today's batch arrives. Separate
    * from [[stored]] (which indexes the full corpus for q272/q357):
    * an append test against an index that already contains the batch
    * would prove nothing.
    */
  def storedBase(s: SparkSession, dir: String): Similarity.IvfPqIndex =
    baseCache.computeIfAbsent(
      dir,
      _ =>
        Similarity.buildIvfPqIndex(
          graft.sources.Tables.parquet(s, dir, "embeddings").filter(!isNewBatch(col("vec_id"))),
          col("vec_id"),
          col("embedding"),
          nlist = 16,
          m = 16,
          ksub = 16,
          root = Scratch.pinned("graft-annindex-base")
        )
    )

  /** [[storedBase]] after today's batch is appended through
    * [[Similarity.appendToIndex]]: the batch encoded with the FROZEN
    * v1 quantizers, corpus_cells/pq_codes grown by append-mode delta
    * files, centroids/codebooks passed through. Built once per dir and
    * shared — the q377 serve and its spec audits both read this.
    */
  def appendedStored(s: SparkSession, dir: String): Similarity.IvfPqIndexPaths =
    appendedCache.computeIfAbsent(
      dir,
      _ =>
        Similarity.appendToIndex(
          graft.sources.Tables.parquet(s, dir, "embeddings").filter(isNewBatch(col("vec_id"))),
          col("vec_id"),
          col("embedding"),
          storedBase(s, dir),
          Similarity.IvfPqIndexPaths(Scratch.pinned("graft-annindex-appended"))
        )
    )

  private val baseCache = new ConcurrentHashMap[String, Similarity.IvfPqIndex]()
  private val appendedCache = new ConcurrentHashMap[String, Similarity.IvfPqIndexPaths]()

  /** [[appendedStored]] after the nightly compaction: the base+delta
    * files of the two corpus-cardinality tables folded into one
    * cell-clustered file each through [[Similarity.compactIndex]];
    * quantizers untouched. Built once per dir and shared — q393's
    * serve and its spec audits both read this.
    */
  def compactedStored(s: SparkSession, dir: String): Similarity.IvfPqIndexPaths =
    compactedCache.computeIfAbsent(
      dir,
      _ =>
        Similarity.compactIndex(
          s,
          appendedStored(s, dir),
          Similarity.IvfPqIndexPaths(Scratch.pinned("graft-annindex-compacted"))
        )
    )

  private val compactedCache = new ConcurrentHashMap[String, Similarity.IvfPqIndexPaths]()
}
