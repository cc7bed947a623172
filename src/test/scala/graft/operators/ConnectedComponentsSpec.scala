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

  test("incremental maintenance equals full recompute when a batch merges two existing clusters") {
    // yesterday: {1,2,3} (label 1), {5,6} (label 5), {8,9} (label 8), singleton 4
    val oldNodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 8L, 9L).toDF("id")
    val oldEdges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L)).toDF("a", "b")
    val oldLabels = ConnectedComponents.minLabel(oldNodes, col("id"), oldEdges, col("a"), col("b"))
    // today: node 10 BRIDGES {1,2,3} and {5,6} (the merge case), node 11
    // attaches to {8,9}, node 12 arrives edge-less; {4} stays untouched
    val newNodes = Seq(10L, 11L, 12L).toDF("id")
    val deltaEdges = Seq((3L, 10L), (10L, 5L), (11L, 9L)).toDF("a", "b")
    val got = ConnectedComponents
      .incrementalMinLabel(newNodes, col("id"), oldLabels, oldEdges, deltaEdges, col("a"), col("b"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val full = ConnectedComponents
      .minLabel(
        oldNodes.unionByName(newNodes),
        col("id"),
        oldEdges.unionByName(deltaEdges),
        col("a"),
        col("b")
      )
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got.view.mapValues(_._1).toMap === full, "maintained labels must equal the full recompute bit-for-bit")
    // the merged component {1,2,3,5,6,10} relabels (5,6 move to 1), the
    // touched {8,9,11} relabels, the edge-less arrival relabels (to
    // itself), and ONLY the untouched singleton 4 is carried through
    assert(got(5L) === ((1L, 1L)) && got(6L) === ((1L, 1L)), "merge must pull the second cluster onto the joint minimum")
    assert(got(12L) === ((12L, 1L)), "an edge-less arrival labels itself through the maintenance pass")
    assert(got(4L) === ((4L, 0L)), "an untouched component must be carried through, not recomputed")
    assert(got.values.count(_._2 == 0L) === 1, "write amplification: only the untouched singleton is carried")
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
