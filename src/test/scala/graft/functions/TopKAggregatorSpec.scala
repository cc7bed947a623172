package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** TopKAggregator: bounded buffers, total-order ties, and — the
  * property that makes it shuffle-safe — partition-invariance: any way
  * of splitting the input into partial buffers merges to the same
  * answer as a single sequential reduce. Pure order statistics, no
  * SparkSession needed.
  */
class TopKAggregatorSpec extends AnyFunSuite {

  private val agg = new TopKAggregator(3)

  private def reduceAll(xs: Seq[Scored]): Seq[Scored] = xs.foldLeft(agg.zero)(agg.reduce)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("keeps the k best by (sim desc, nid asc)") {
    val xs = Seq(Scored(0.5, 1), Scored(0.9, 2), Scored(0.7, 3), Scored(0.9, 1), Scored(0.1, 9))
    assert(reduceAll(xs) === Seq(Scored(0.9, 1), Scored(0.9, 2), Scored(0.7, 3)))
  }

  test("buffer never exceeds k, even on sorted adversarial input") {
    val xs = (1 to 100).map(i => Scored(i / 100.0, i.toLong))
    val buf = xs.foldLeft(agg.zero) { (b, x) =>
      val nb = agg.reduce(b, x)
      assert(nb.length <= 3)
      nb
    }
    assert(buf === Seq(Scored(1.0, 100), Scored(0.99, 99), Scored(0.98, 98)))
  }

  test("merge of any split == sequential reduce (partition invariance)") {
    val scoredGen = for {
      sim <- Gen.chooseNum(0.0, 1.0)
      nid <- Gen.chooseNum(0L, 50L)
    } yield Scored(sim, nid)
    check(Prop.forAll(Gen.listOf(scoredGen), Gen.chooseNum(0, 100)) { (xs, cutPct) =>
      val cut = xs.length * cutPct / 100
      val (a, b) = xs.splitAt(cut)
      agg.merge(reduceAll(a), reduceAll(b)) == reduceAll(xs)
    })
  }

  test("merge is commutative and respects zero") {
    val scoredGen = for {
      sim <- Gen.oneOf(0.1, 0.5, 0.9) // force sim ties so nid ordering matters
      nid <- Gen.chooseNum(0L, 20L)
    } yield Scored(sim, nid)
    check(Prop.forAll(Gen.listOf(scoredGen), Gen.listOf(scoredGen)) { (xs, ys) =>
      val a = reduceAll(xs)
      val b = reduceAll(ys)
      agg.merge(a, b) == agg.merge(b, a) &&
      agg.merge(a, agg.zero) == a &&
      agg.merge(agg.zero, b) == b
    })
  }

  test("NaN sims keep the order total: NaN ranks first and never poisons the buffer") {
    // NaN arrives mid-stream; later high-sim candidates must still enter
    val xs = Seq(Scored(0.5, 1), Scored(Double.NaN, 7), Scored(0.9, 2), Scored(0.99, 4), Scored(0.7, 3))
    val got = reduceAll(xs)
    assert(got.map(_.nid) === Seq(7L, 4L, 2L), got.toString) // NaN first (DESC order), then 0.99, 0.9
    assert(got.head.sim.isNaN)
    // and merge agrees regardless of which side held the NaN
    val a = reduceAll(Seq(Scored(Double.NaN, 7), Scored(0.5, 1)))
    val b = reduceAll(Seq(Scored(0.99, 4), Scored(0.9, 2)))
    assert(agg.merge(a, b).map(_.nid) === Seq(7L, 4L, 2L))
    assert(agg.merge(b, a).map(_.nid) === Seq(7L, 4L, 2L))
  }

  test("-0.0 and +0.0 sims tie (SQL zero equality), broken by nid") {
    val xs = Seq(Scored(0.0, 9), Scored(-0.0, 3), Scored(-1.0, 1))
    assert(reduceAll(xs).map(_.nid) === Seq(3L, 9L, 1L))
  }
}
