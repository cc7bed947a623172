package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SpaceFillSpec extends SparkSpec {

  private val order = 6
  private val n = 1 << order // 64

  test("hilbert index is a bijection on the 64×64 grid") {
    val ds = for { x <- 0L until n; y <- 0L until n } yield SpaceFill.hilbertD(order, x, y)
    assert(ds.distinct.size === n * n)
    assert(ds.min === 0L && ds.max === n.toLong * n - 1)
  }

  test("hilbert is CONTINUOUS: consecutive indices are always grid-adjacent — the locality z-order lacks") {
    val byD = (for { x <- 0L until n; y <- 0L until n } yield SpaceFill.hilbertD(order, x, y) -> (x, y)).toMap
    (0L until n.toLong * n - 1).foreach { d =>
      val (x1, y1) = byD(d)
      val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L, s"seam at d=$d: ($x1,$y1)→($x2,$y2)")
    }
    // contrast: Morton DOES have seams (the property the q388 advisor
    // prices) — at least one consecutive pair jumps across the grid
    def morton(x: Long, y: Long): Long =
      (0 until order).map(i => (((x >> i) & 1) << (2 * i + 1)) | (((y >> i) & 1) << (2 * i))).sum
    val byZ = (for { x <- 0L until n; y <- 0L until n } yield morton(x, y) -> (x, y)).toMap
    val seams = (0L until n.toLong * n - 1).count { d =>
      val (x1, y1) = byZ(d)
      val (x2, y2) = byZ(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1L
    }
    assert(seams > 0, "z-order unexpectedly continuous — the advisor's premise would be false")
  }

  test("the generated SQL chain evaluates identically to the driver reference over the full grid") {
    var df = spark
      .range(0, n.toLong * n)
      .selectExpr(s"id div $n AS x0", s"id % $n AS y0")
      .withColumn("db", col("x0"))
      .withColumn("pb", col("y0"))
      .withColumn("hd", lit(0L))
    SpaceFill.levels(order).zipWithIndex.foreach { case (s, k) =>
      val (nx, ny, dt) = SpaceFill.hilbertStep(s, s"x$k", s"y$k")
      df = df
        .withColumn(s"x${k + 1}", expr(nx))
        .withColumn(s"y${k + 1}", expr(ny))
        .withColumn("hd", col("hd") + expr(dt))
    }
    df.select("db", "pb", "hd").collect().foreach { r =>
      val expected = SpaceFill.hilbertD(order, r.getLong(0), r.getLong(1))
      assert(r.getLong(2) === expected, s"(${r.getLong(0)},${r.getLong(1)})")
    }
  }
}
