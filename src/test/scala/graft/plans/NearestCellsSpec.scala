package graft.plans

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** The IVF quantizer's scale contract: the centroid matrix rides as ONE
  * plan reference, so plan size and codegen are independent of nlist —
  * the failure mode this replaces (per-centroid struct literals) broke
  * whole-stage codegen past a few thousand cells.
  */
class NearestCellsSpec extends SparkSpec {
  import spark.implicits._

  private def cells(vec: Array[Float], cents: Array[Array[Double]], n: Int): Seq[Int] = {
    val df = Seq(Tuple1(vec)).toDF("v")
    import org.apache.spark.sql.graft.bridge
    df.select(bridge.column(NearestCells(bridge.expression(col("v")), cents, n)).as("c"))
      .collect()(0)
      .getSeq[Int](0)
  }

  test("ranking is (score desc, index desc) — exact ties go to the higher cell") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0)) // 0 and 2 tie exactly
    assert(cells(Array(1.0f, 0.0f), cents, 3) === Seq(2, 0, 1))
    assert(cells(Array(0.0f, 1.0f), cents, 1) === Seq(1))
  }

  test("n > nlist returns all cells, still rank-ordered") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    assert(cells(Array(1.0f, 2.0f), cents, 5) === Seq(1, 0))
  }

  test("matches the struct-literal formulation it replaced") {
    val dim = 8
    val cents = Array.tabulate(4, dim)((j, d) => math.sin(j * dim + d))
    val vecs = spark
      .range(200)
      .select(col("id"), expr(s"transform(sequence(0, ${dim - 1}), i -> cast(sin(id * $dim + i) as float))").as("v"))
    import org.apache.spark.sql.graft.bridge
    val mine = vecs.select(col("id"), bridge.column(NearestCells(bridge.expression(col("v")), cents, 1)).getItem(0).as("cell"))
    // the old shape: argmax over per-centroid struct literals
    val scored = cents.zipWithIndex.map { case (c, j) =>
      val half = c.map(x => x * x).sum / 2.0
      struct((graft.functions.VectorOps.dot(col("v"), typedlit(c)) - lit(half)).as("s"), lit(j).as("j"))
    }
    val old = vecs.select(col("id"), array_max(array(scored.toIndexedSeq: _*)).getField("j").as("cell"))
    assert(mine.except(old).isEmpty && old.except(mine).isEmpty)
  }

  test("nlist=1024: plan stays O(1), codegen does not fall back, IVF completes") {
    val dim = 16
    val vecs = spark
      .range(3000)
      .select(col("id").as("vec_id"), expr(s"transform(sequence(0, ${dim - 1}), i -> cast(sin(cast(vec_id as double) * $dim + i) as float))").as("embedding"))
    val topk = Similarity.ivfTopK(vecs, col("vec_id"), col("embedding"), col("vec_id") < 10, nlist = 1024, nprobe = 8, k = 3, lloydIters = 1)
    // plan must not inline the matrix: 1024×16 struct literals would be
    // hundreds of KB of tree; the reference-object form stays tiny
    val planStr = topk.queryExecution.optimizedPlan.treeString
    assert(planStr.length < 200000, s"plan blew up with nlist: ${planStr.length} chars")
    // generated code calls into the expression (doGenCode ran — a
    // CodegenFallback would instead interpret eval() per row)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val codegen =
      try topk.queryExecution.explainString(ExplainMode.fromString("codegen"))
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(codegen.contains("topCells"), "NearestCells must compile into generated code")
    val rows = topk.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("rank") <= 3))
  }
}
