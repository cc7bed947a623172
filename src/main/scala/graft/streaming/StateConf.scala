package graft.streaming

import org.apache.spark.sql.SparkSession

/** Per-query state-partition sizing for streaming starts.
  *
  * A streaming query fixes its state-store partition count from
  * `spark.sql.shuffle.partitions` at `start()` — and then every
  * micro-batch pays per-partition state-store open/commit I/O whether
  * or not the partition holds state. Batch width (CPU-bound shuffles)
  * and state width (store count, per-partition fixed cost) are
  * different resources: size the former to cores, the latter to state
  * volume. This helper pins the width for the duration of one
  * streaming run and restores the session's batch setting after —
  * checkpointed production queries keep whatever width they started
  * with (state partitioning is frozen into the checkpoint), so this is
  * a start-time decision exactly like it is here.
  */
object StateConf {

  private val Key = "spark.sql.shuffle.partitions"

  /** Run `body` (build + start + await one streaming query) with the
    * shuffle width set to `n`, restoring the previous value after.
    */
  def withStatePartitions[A](spark: SparkSession, n: Int)(body: => A): A = {
    val prev = spark.conf.get(Key)
    spark.conf.set(Key, n.toString)
    try body
    finally spark.conf.set(Key, prev)
  }
}
