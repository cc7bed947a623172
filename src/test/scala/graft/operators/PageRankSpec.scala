package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PageRankSpec extends SparkSpec {

  import spark.implicits._

  private def ranks(parts: Int) = {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("a", "b").repartition(parts)
    val nodes = spark.range(1, 7).select(col("id").as("n")) // 5,6 isolated
    PageRank
      .integerPageRank(nodes, col("n"), edges, col("a"), col("b"), iters = 10)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("deg"), r.getAs[Long]("pr")))
      .sortBy(_._1)
  }

  test("mass is conserved up to floor leakage; hub outranks the spoke") {
    val r = ranks(4)
    val total = r.map(_._3).sum
    // each of 10 iterations leaks <1 unit per division; total stays within
    // a generous bound below One and never exceeds it
    assert(total <= PageRank.One)
    assert(total > PageRank.One / 2, s"floor leakage implausibly large: $total")
    val pr = r.map(t => t._1 -> t._3).toMap
    assert(pr(1L) > pr(4L), "node 1 (degree 3) must outrank the leaf 4")
  }

  test("isolated nodes hold exactly the teleport term") {
    val r = ranks(3)
    val teleport = 15L * PageRank.One / (100L * 6L)
    r.filter(_._2 == 0L).foreach { case (_, _, pr) => assert(pr === teleport) }
  }

  test("identical ranks at any partitioning (integer math is order-free)") {
    assert(ranks(1).toSeq === ranks(7).toSeq)
  }
}
