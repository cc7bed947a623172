package graft.sources

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  test("bucketed-by-key join plans with zero shuffles and matches the plain join") {
    val orders = Tables.parquet(spark, sfDir, "orders")
    val lineitem = Tables.parquet(spark, sfDir, "lineitem")
    Bucketing.writeBucketed(orders.withColumnRenamed("o_orderkey", "k"), "orders_b", "k", 8)
    Bucketing.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "k"), "lineitem_b", "k", 8)

    val joined = Bucketing
      .table(spark, "orders_b")
      .join(Bucketing.table(spark, "lineitem_b"), "k")
    // disable broadcast so the test exercises the bucket (not broadcast) path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.explainString(ExplainMode.fromString("simple"))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      val expected = orders.join(lineitem, orders("o_orderkey") === lineitem("l_orderkey")).count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("aggregation on the bucket key needs no exchange either") {
    val agg = Bucketing.table(spark, "lineitem_b").groupBy("k").agg(sum("l_quantity"))
    val plan = agg.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!plan.contains("Exchange hashpartitioning(k"), s"bucketed agg must not shuffle on k:\n$plan")
  }
}
