package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Idempotent truncate-and-load sink with retry — the Spark restatement
  * of the reference's MongoDB sink (`db_insert`, `app.py:645-740`):
  * drop-all-collections first (`app.py:661-669`) → per-partition
  * record-oriented insert (`app.py:685-700`) → outer retry loop, ≤6
  * attempts, 60 s backoff (`app.py:710-720`).
  *
  * Truncate-first maps to `SaveMode.Overwrite` (atomic via the file
  * committer — strictly safer than the reference's drop-then-insert
  * window where readers see an empty DB). The record-oriented path for
  * external connectors is `foreachPartition`, so one connection per
  * partition, not per row — the shape that survives 1000 executors.
  */
object RetryingSink {

  final case class RetryPolicy(maxAttempts: Int = 6, backoffMillis: Long = 60000L)

  /** Run `action` under the reference's retry contract. Returns the
    * number of attempts used; throws the last failure when exhausted.
    */
  def withRetry[A](policy: RetryPolicy = RetryPolicy(), sleep: Long => Unit = Thread.sleep)(action: () => A): (A, Int) = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < policy.maxAttempts) {
      attempt += 1
      try return (action(), attempt)
      catch {
        case e: Throwable =>
          last = e
          if (attempt < policy.maxAttempts) sleep(policy.backoffMillis)
      }
    }
    throw last
  }

  /** Truncate-and-load to parquet (our offline stand-in for the Mongo
    * collection; one output dir per "collection").
    */
  def overwriteParquet(df: DataFrame, path: String, policy: RetryPolicy = RetryPolicy(), sleep: Long => Unit = Thread.sleep): Int = {
    val (_, attempts) = withRetry(policy, sleep) { () =>
      df.write.mode(SaveMode.Overwrite).parquet(path)
    }
    attempts
  }

  /** Append-mode write with the same retry contract as
    * [[overwriteParquet]] — the delta-ingest half of the sink surface:
    * new files land NEXT TO the existing table's, nothing already
    * stored is rewritten (the whole point of an append at 100 TB: the
    * write cost follows the batch, not the table). Idempotence caveat
    * is real and intentional: a retry after a PARTIAL append can
    * duplicate rows, which is why production appends carry a batch id
    * for dedup-on-read — callers that need exactly-once compose this
    * with the q299 idempotent-sink discipline.
    */
  def appendParquet(df: DataFrame, path: String, policy: RetryPolicy = RetryPolicy(), sleep: Long => Unit = Thread.sleep): Int = {
    val (_, attempts) = withRetry(policy, sleep) { () =>
      df.write.mode(SaveMode.Append).parquet(path)
    }
    attempts
  }

  /** Snapshot checkpoint (SURVEY §2.1 S8): truncate-and-load the frame
    * to parquet and read it back — the lineage-cutting snapshot the
    * reference sketches as a pickle dump of the raw ingested chunks
    * (`app.py:197-199`, commented). Downstream plans re-read columnar
    * bytes instead of replaying the ingest lineage; at 100 TB this is
    * the natural stage boundary (and the retry contract makes it the
    * safe restart point).
    */
  def snapshotParquet(df: DataFrame, path: String, policy: RetryPolicy = RetryPolicy(), sleep: Long => Unit = Thread.sleep): DataFrame = {
    overwriteParquet(df, path, policy, sleep)
    df.sparkSession.read.parquet(path)
  }

  /** [[snapshotParquet]] for any Spark file format ("orc", "json",
    * "csv", ...) — the snapshot contract is format-agnostic; ORC is the
    * columnar alternative a warehouse migration would demand, with the
    * same pushdown/pruning surface as parquet at the scan.
    */
  def snapshotFormat(
      df: DataFrame,
      path: String,
      format: String,
      policy: RetryPolicy = RetryPolicy(),
      sleep: Long => Unit = Thread.sleep
  ): DataFrame = {
    withRetry(policy, sleep) { () =>
      df.write.mode(SaveMode.Overwrite).format(format).save(path)
    }
    df.sparkSession.read.format(format).load(path)
  }

  /** Hive-style partitioned truncate-and-load: one directory per value
    * of each partition column. At 100 TB the partition layout IS the
    * index: a reader filtering on a partition column enumerates only
    * the matching directories (the predicate lands in the scan's
    * `PartitionFilters`, pruning at planning time), instead of reading
    * every file and filtering rows after decode. The reference's
    * one-collection-per-month Mongo layout (`app.py:645-669`) is this
    * same idea — month as a physical routing key — done here by the
    * table format. Keep partition columns low-cardinality (enum, day):
    * a high-cardinality key makes a small-files swamp, not an index.
    */
  def overwritePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      policy: RetryPolicy = RetryPolicy(),
      sleep: Long => Unit = Thread.sleep
  ): DataFrame = {
    withRetry(policy, sleep) { () =>
      df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)
    }
    df.sparkSession.read.parquet(path)
  }

  /** Record-oriented export: stream each partition's rows to a
    * connector-style consumer (reference: `to_dict(orient='records')` +
    * `insert_many`, `app.py:685-700`). The consumer factory runs once
    * per partition on the executor — connection-per-partition, the
    * distributed analogue of the reference's single driver-side client.
    */
  def foreachPartitionSink(df: DataFrame)(consume: Iterator[Map[String, Any]] => Unit): Unit = {
    val fields = df.schema.fieldNames
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      consume(rows.map(r => fields.zipWithIndex.map { case (f, i) => f -> r.get(i) }.toMap))
    }
  }
}
