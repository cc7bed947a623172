package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Persist-backed round materialization for iterative operators
  * (connected components, label propagation, k-core, truss peeling,
  * HITS, PageRank).
  *
  * The old discipline snapshotted EVERY round to parquet (write + read
  * back) and ran convergence checksums as separate aggregation jobs.
  * That is robust but pays, per round: a parquet encode + commit
  * protocol + re-listing on the driver, and one extra full pass for the
  * checksum. Profiled at sf0.1 (guide §1): q330_hits ran 117 jobs with
  * half its wall in driver-side gaps between them; q358 ran 106.
  *
  * This helper keeps the same structure — each round is materialized
  * before the next is planned, lineage is cut periodically, the final
  * frame handed back to callers is a plain parquet scan — but:
  *
  *  - a round materializes into the block-manager cache
  *    (`persist()` + `count()`), not a parquet file: one action, no
  *    commit protocol, no re-listing;
  *  - convergence/census metrics ride the SAME action via
  *    `Dataset.observe` (`CollectMetrics` evaluates inline while rows
  *    stream into the cache) — the separate checksum job disappears;
  *  - the previous round's blocks are dropped as soon as the next round
  *    is materialized, so at most two rounds are ever cached;
  *  - every `parquetEvery` rounds the live round is written to parquet
  *    and re-read, cutting lineage growth (the CC union references the
  *    previous round twice, so an uncut plan doubles per round — the
  *    barrier bounds the analyzer walk at 2^parquetEvery subtrees, and
  *    on a cluster bounds recomputation after executor loss exactly
  *    like GraphX's checkpointInterval);
  *  - [[finish]] writes the final frame to parquet, releases every
  *    cached round, and returns the plain scan — callers' returned-
  *    frame contract is unchanged, and no cached blocks outlive the
  *    operator (the NoLeakSpec discipline).
  */
final class Rounds(spark: org.apache.spark.sql.SparkSession, base: String, parquetEvery: Int = 6) {

  private var prev: Option[DataFrame] = None
  private var n = 0

  /** Materialize one round. Returns the frame the NEXT round should
    * build on (cached, or a parquet scan at barrier rounds) plus the
    * observed metrics (empty map when none were asked for).
    */
  def next(df: DataFrame, metrics: Seq[Column] = Nil): (DataFrame, Map[String, Any]) = {
    n += 1
    val obs = if (metrics.nonEmpty) Some(Observation()) else None
    val observed = obs match {
      case Some(o) => df.observe(o, metrics.head, metrics.tail: _*)
      case None => df
    }
    val cached = observed.persist()
    cached.count()
    val got: Map[String, Any] = obs.map(_.get).getOrElse(Map.empty)
    prev.foreach(_.unpersist())
    if (n % parquetEvery == 0) {
      val path = s"$base/round_barrier_$n"
      cached.write.mode("overwrite").parquet(path)
      cached.unpersist()
      prev = None
      (spark.read.parquet(path), got)
    } else {
      prev = Some(cached)
      (cached, got)
    }
  }

  /** Write `df` (typically the last round or a projection of it) to
    * `base/name`, release every cached round, and return the plain
    * parquet scan.
    */
  def finish(df: DataFrame, name: String): DataFrame = {
    val path = s"$base/$name"
    df.write.mode("overwrite").parquet(path)
    release()
    spark.read.parquet(path)
  }

  /** Drop any still-cached round (for callers that parquet the final
    * frame themselves).
    */
  def release(): Unit = {
    prev.foreach(_.unpersist())
    prev = None
  }
}
