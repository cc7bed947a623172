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

  test("mapstate type counts equal the batch keyed count") {
    val streamed = graft.Queries.mapStateTypeCounts(spark, sfDir).collect()
    val batch = graft.sources.Tables
      .parquet(spark, sfDir, "events")
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("user_id", "event_type")
      .collect()
    assert(streamed.length === batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getAs[Long]("user_id") === b.getAs[Long]("user_id"))
      assert(s.getAs[String]("event_type") === b.getAs[String]("event_type"))
      assert(s.getAs[Long]("n") === b.getAs[Long]("n"))
    }
  }

  test("liststate earliest-k: exactly the batch rank-window answer, k-bounded per user") {
    val streamed = graft.Queries.listStateEarliest(spark, sfDir).collect()
    streamed.groupBy(_.getAs[Long]("user_id")).foreach { case (_, g) =>
      assert(g.length <= 3)
      assert(g.map(_.getAs[Int]("rnk")).sorted.toSeq === (1 to g.length))
    }
    val batch = graft.sources.Tables
      .parquet(spark, sfDir, "events")
      .withColumn("ts_ms", expr("unix_millis(ts)"))
      .withColumn(
        "rnk",
        org.apache.spark.sql.functions.row_number
          .over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("user_id")
              .orderBy(col("ts_ms"), col("event_id"))
          )
      )
      .filter(col("rnk") <= 3)
      .orderBy("user_id", "rnk")
      .select("user_id", "rnk", "event_id", "ts_ms")
      .collect()
    assert(streamed.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
      === batch.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq)
  }

  test("multi-batch replay (q256) equals the single-batch run row for row") {
    // the runner itself require()s >= 4 data batches, so passing here
    // proves cross-batch state merging — not just the single-batch path
    val multi = StateV2.lifetimeStatsMultiBatch(spark, sfDir).collect()
    val single = StateV2.lifetimeStats(spark, sfDir).collect()
    assert(multi.map(_.toSeq).toSeq === single.map(_.toSeq).toSeq)
  }
}
