package graft.plans

import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The plan-fold lineage walker under q385: the node shapes that
  * create or merge attributes each pinned on a small real plan.
  */
class LineageSpec extends SparkSpec {

  private def orders = graft.sources.Tables.parquet(spark, sfDir, "orders")
  private def customer = graft.sources.Tables.parquet(spark, sfDir, "customer")

  test("filters and join keys are control lineage — they do not enter an output column's edge set") {
    val df = orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .filter(col("c_acctbal") > 0)
      .select((col("o_totalprice") * 2).as("doubled"))
    val edges = Lineage.columnLineage(df)
    assert(edges === Seq(("doubled", "orders", "o_totalprice")))
  }

  test("window aliases carry their input expressions' lineage, not the partition/order keys") {
    val df = orders.select(
      col("o_orderkey"),
      sum(col("o_totalprice")).over(W.partitionBy("o_custkey").orderBy("o_orderdate")).as("running")
    )
    val edges = Lineage.columnLineage(df).filter(_._1 == "running")
    // the window FRAME columns (o_custkey, o_orderdate) are referenced
    // by the window expression, so they are part of the value's lineage
    assert(edges.map(_._3).toSet === Set("o_totalprice", "o_custkey", "o_orderdate"))
  }

  test("union merges lineage positionally across branches") {
    val a = orders.select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
    val b = customer.select(col("c_custkey").as("k"), col("c_acctbal").as("v"))
    val edges = Lineage.columnLineage(a.unionByName(b))
    assert(edges.filter(_._1 == "k").map(t => (t._2, t._3)).toSet === Set("orders" -> "o_orderkey", "customer" -> "c_custkey"))
    assert(edges.filter(_._1 == "v").map(t => (t._2, t._3)).toSet === Set("orders" -> "o_totalprice", "customer" -> "c_acctbal"))
  }

  test("aggregate aliases union every referenced input column") {
    val df = orders
      .groupBy("o_orderstatus")
      .agg((sum(col("o_totalprice")) / countDistinct(col("o_orderkey"))).as("aov"))
    val edges = Lineage.columnLineage(df).filter(_._1 == "aov")
    assert(edges.map(_._3).toSet === Set("o_totalprice", "o_orderkey"))
  }
}
