package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** transformWithState (v2 state API): the streaming run must equal the
  * batch aggregate row for row, leave no session conf residue, and be
  * deterministic across micro-batch layouts (the counters are
  * order-independent merges — asserted against the batch answer, which
  * has no batching at all).
  */
class StateV2Spec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  test("lifetime stats equal the batch aggregate and restore the provider conf") {
    val before = spark.conf.getOption(ProviderKey)
    val streamed = graft.Queries.transformWithStateStats(spark, sfDir).collect()
    assert(spark.conf.getOption(ProviderKey) === before, "provider conf leaked")

    val batch = graft.sources.Tables
      .parquet(spark, sfDir, "events")
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(coalesce(floor(col("value") * 100 + 0.5).cast("long"), lit(0L))).as("sum_cents"),
        min(expr("unix_millis(ts)")).as("first_ms"),
        max(expr("unix_millis(ts)")).as("last_ms"),
        sum((col("event_type") === "purchase").cast("long")).as("n_purchase")
      )
      .orderBy("user_id")
      .collect()
    assert(streamed.length === batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getAs[Long]("user_id") === b.getAs[Long]("user_id"))
      assert(s.getAs[Long]("n_events") === b.getAs[Long]("n_events"))
      assert(s.getAs[Long]("sum_cents") === b.getAs[Long]("sum_cents"))
      assert(s.getAs[Long]("first_ms") === b.getAs[Long]("first_ms"))
      assert(s.getAs[Long]("last_ms") === b.getAs[Long]("last_ms"))
      assert(s.getAs[Long]("n_purchase") === b.getAs[Long]("n_purchase"))
    }
  }
}
