package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over a pair graph — the rung of the dedup
  * ladder ABOVE candidate pairs: near-dup pairs only say "these two are
  * duplicates"; deduplication needs the transitive closure (a≈b, b≈c ⇒
  * {a,b,c} are one cluster) and ONE canonical keeper per cluster.
  * (The reference's exact dedup, `app.py:427-480`, never needs this —
  * exact-hash groups are already transitive; similarity graphs are
  * not.)
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with itself; each round, a node's label becomes the min of
  * its own and its neighbors'; converged when no label changes. Rounds
  * = graph diameter — and near-dup graphs are overwhelmingly
  * tiny-diameter star/clique clusters, so 3-5 rounds in practice. Each
  * round is one join + one aggregation (two shuffles), all keyed on
  * node id: no driver-side graph, no collect — node and edge sets
  * stream through exchanges at any scale. (The round-count optimization
  * for adversarial long-chain graphs is alternating large-star /
  * small-star [Kiveris et al., "Connected Components in MapReduce"];
  * same per-round plan shape, fewer rounds — the swap-in if diameter
  * ever bites.)
  *
  * Lineage: every round SNAPSHOTS its label table (write parquet, read
  * back) — the iterative-job checkpoint every production graph engine
  * uses (GraphX/GraphFrames checkpointInterval). Each round references
  * the previous labels twice (self ∪ via-neighbor), so an un-truncated
  * lineage doubles per round — 2^rounds subtrees by round 30; the
  * snapshot keeps every round's plan constant-size, leaves NO cached
  * blocks behind (NoLeakSpec), and makes the returned frame a plain
  * parquet scan. Superseded rounds and the edge snapshot are deleted as
  * the loop advances; the FINAL round's snapshot backs the returned
  * frame and lives until the scratch dir goes (JVM temp by default —
  * pass `scratchDir` to own the lifecycle; it must be cluster-visible
  * storage in production).
  *
  * Determinism: min-label is order-free — the converged labeling is a
  * pure function of the graph, independent of partitioning, round
  * count past convergence, or tie order. The DuckDB oracle computes the
  * same fixpoint with a recursive CTE.
  */
object ConnectedComponents {

  /** One row per node: (id, cluster) where cluster = min node id
    * reachable through `edges` (undirected; pass each pair once).
    */
  def minLabel(
      nodes: DataFrame,
      id: Column,
      edges: DataFrame,
      a: Column,
      b: Column,
      maxIters: Int = 20,
      scratchDir: Option[String] = None
  ): DataFrame = {
    val spark = nodes.sparkSession
    val base = scratchDir.getOrElse(Files.createTempDirectory("graft-cc").toString)

    def snapshot(df: DataFrame, name: String): DataFrame = {
      val path = s"$base/$name"
      df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    def dropSnapshot(name: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(s"$base/$name")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true): Unit
    }

    // symmetrize once — and snapshot: the edge pipeline (for q80, the
    // whole minhash+banding candidate generation) must run ONCE, not
    // once per propagation round
    val sym = snapshot(
      edges
        .select(a.as("src"), b.as("dst"))
        .unionByName(edges.select(b.as("src"), a.as("dst"))),
      "edges"
    )

    var labels = snapshot(nodes.select(id.as("id"), id.as("lbl")), "round_0")
    var round = 0
    var converged = false
    while (!converged && round < maxIters) {
      round += 1
      // a node's next label: min of its own and every neighbor's
      val viaNeighbor = sym
        .join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      val next = snapshot(
        labels.unionByName(viaNeighbor).groupBy("id").agg(min("lbl").as("lbl")),
        s"round_$round"
      )
      val changed = next
        .join(labels.withColumnRenamed("lbl", "prev"), "id")
        .filter(col("lbl") =!= col("prev"))
        .count()
      dropSnapshot(s"round_${round - 1}") // only the latest round is live
      labels = next
      converged = changed == 0
    }
    // silent truncation would return WRONG clusters (and diverge from
    // the oracle's exact fixpoint) — refuse instead
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds — graph diameter exceeds the cap; raise maxIters"
      )
    dropSnapshot("edges")
    labels.withColumnRenamed("lbl", "cluster")
  }
}
