package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chain + clique + singleton resolve to min-id clusters") {
    val nodes = (1L to 8L).toDF("id")
    // chain 1-2-3 (transitivity across hops), clique 4-5-6, pair 7-8... and 8 alone? no: pair (7,8)
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (7L, 8L)).toDF("a", "b")
    val got = ConnectedComponents
      .minLabel(nodes, col("id"), edges, col("a"), col("b"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 7L, 8L -> 7L))
  }

  test("long chain converges past several propagation rounds") {
    val n = 30L
    val nodes = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val got = ConnectedComponents.minLabel(nodes, col("id"), edges, col("a"), col("b"), maxIters = 50).collect()
    assert(got.forall(_.getLong(1) === 1L), "every chain node must reach label 1")
  }

  test("refuses to return truncated labels when the round cap is too low") {
    val nodes = (1L to 10L).toDF("id")
    val edges = (1L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.minLabel(nodes, col("id"), edges, col("a"), col("b"), maxIters = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("alternating-star equals min-label on chains, cliques, and seeded random graphs") {
    def compare(nodes: org.apache.spark.sql.DataFrame, edges: org.apache.spark.sql.DataFrame): Unit = {
      val viaLabel = ConnectedComponents
        .minLabel(nodes, col("id"), edges, col("a"), col("b"), maxIters = 60)
        .orderBy("id")
        .collect()
        .toSeq
      val viaStar = ConnectedComponents
        .alternatingStar(nodes, col("id"), edges, col("a"), col("b"))
        .orderBy("id")
        .collect()
        .toSeq
      assert(viaStar === viaLabel)
    }
    // 40-node chain: diameter stress (star needs O(log n) rounds)
    compare((1L to 40L).toDF("id"), (1L until 40L).map(i => (i, i + 1)).toDF("a", "b"))
    // two cliques + singletons
    val cliqueEdges = (for { x <- 1L to 5L; y <- 1L to 5L if x < y } yield (x, y)) ++
      (for { x <- 10L to 13L; y <- 10L to 13L if x < y } yield (x, y))
    compare((1L to 15L).toDF("id"), cliqueEdges.toDF("a", "b"))
    // seeded random graph: 60 nodes, 50 arbitrary edges
    val rnd = new scala.util.Random(42)
    val randomEdges = Seq.fill(50)((rnd.nextInt(60).toLong + 1, rnd.nextInt(60).toLong + 1)).filter(p => p._1 != p._2)
    compare((1L to 60L).toDF("id"), randomEdges.toDF("a", "b"))
  }

  test("labels are independent of edge orientation") {
    val nodes = (1L to 4L).toDF("id")
    val forward = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val reversed = Seq((2L, 1L), (4L, 3L)).toDF("a", "b")
    val f = ConnectedComponents.minLabel(nodes, col("id"), forward, col("a"), col("b")).orderBy("id").collect().toSeq
    val r = ConnectedComponents.minLabel(nodes, col("id"), reversed, col("a"), col("b")).orderBy("id").collect().toSeq
    assert(f === r)
  }
}
