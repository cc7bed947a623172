package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WeightedQuantilesSpec extends SparkSpec {

  private lazy val orders = graft.sources.Tables.parquet(spark, sfDir, "orders")

  test("histogram median equals the naive sorted-middle median") {
    val hist = WeightedQuantiles.histogram(orders, col("o_orderpriority"), col("o_totalprice"))
    val got = WeightedQuantiles
      .median(hist)
      .collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Double]("median"))
      .toMap
    val naive = orders
      .select("o_orderpriority", "o_totalprice")
      .collect()
      .groupBy(_.getAs[String]("o_orderpriority"))
      .map { case (g, rows) =>
        val v = rows.map(_.getAs[Double]("o_totalprice")).sorted
        val n = v.length
        g -> (v((n - 1) / 2) + v(n / 2)) / 2.0
      }
    assert(got === naive)
  }

  test("percentile boundaries are exact order statistics at ceil(p*n)") {
    val hist = WeightedQuantiles.histogram(orders, col("o_orderpriority"), col("o_totalprice"))
    val got = WeightedQuantiles
      .percentiles(hist, Seq(100, 500, 900))
      .collect()
      .map(r => r.getAs[String]("g") -> (r.getAs[Double]("p100"), r.getAs[Double]("p500"), r.getAs[Double]("p900")))
      .toMap
    orders
      .select("o_orderpriority", "o_totalprice")
      .collect()
      .groupBy(_.getAs[String]("o_orderpriority"))
      .foreach { case (g, rows) =>
        val v = rows.map(_.getAs[Double]("o_totalprice")).sorted
        def at(p: Int) = v(((v.length.toLong * p + 999) / 1000).toInt - 1)
        assert(got(g) === ((at(100), at(500), at(900))), s"group $g")
      }
  }

  test("no row-level rank window exists in the median plan") {
    val hist = WeightedQuantiles.histogram(orders, col("o_orderpriority"), col("o_totalprice"))
    val plan = WeightedQuantiles.median(hist).queryExecution.executedPlan.toString
    // windows run over the distinct-value histogram (post-aggregate),
    // never over the raw fact scan: every Window sits above a HashAggregate
    val windowIdx = plan.linesIterator.zipWithIndex.filter(_._1.contains("Window")).map(_._2).toSeq
    val aggIdx = plan.linesIterator.zipWithIndex.filter(_._1.contains("HashAggregate")).map(_._2).toSeq
    assert(windowIdx.nonEmpty && aggIdx.nonEmpty)
    // in executedPlan string, children print BELOW parents: each Window
    // must have a HashAggregate somewhere below it (larger index)
    windowIdx.foreach(w => assert(aggIdx.exists(_ > w), s"window at line $w has no aggregate beneath"))
  }
}
