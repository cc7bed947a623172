package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(
      iv: Seq[(Long, Long, Long)],
      pt: Seq[(Long, Long)]
  ): Set[(Long, Long, Long)] =
    (for {
      (iid, s, e) <- iv
      (pid, at) <- pt
      if at >= s && at < e
    } yield (iid, pid, at)).toSet

  private def run(iv: Seq[(Long, Long, Long)], pt: Seq[(Long, Long)], bin: Long) =
    IntervalJoin
      .pointsInIntervals(
        iv.toDF("id", "s", "e"),
        col("id"),
        col("s"),
        col("e"),
        pt.toDF("id", "at"),
        col("id"),
        col("at"),
        bin
      )
      .as[(Long, Long, Long)]
      .collect()

  private val iv = Seq(
    (1L, 100L, 200L), // one bin (width 100)
    (2L, 150L, 450L), // spans several bins
    (3L, 300L, 300L), // empty — matches nothing
    (4L, 0L, 1000L) // covers everything
  )
  private val pt = Seq((10L, 99L), (11L, 100L), (12L, 199L), (13L, 200L), (14L, 449L), (15L, 450L))

  test("binned join equals the brute-force theta join") {
    val got = run(iv, pt, bin = 100L)
    assert(got.length === got.toSet.size, "no duplicate pairs (a point lives in one bin)")
    assert(got.toSet === brute(iv, pt))
  }

  test("result is bin-width invariant (replication factor is a knob, not semantics)") {
    val expect = brute(iv, pt)
    for (bin <- Seq(1L, 7L, 100L, 1000L, 100000L))
      assert(run(iv, pt, bin).toSet === expect, s"bin=$bin")
  }

  test("half-open semantics: start inclusive, end exclusive") {
    val got = run(Seq((1L, 100L, 200L)), Seq((10L, 100L), (11L, 200L)), 50L).toSet
    assert(got === Set((1L, 10L, 100L)))
  }
}
