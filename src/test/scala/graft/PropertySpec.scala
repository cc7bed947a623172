package graft

import java.time.LocalDate

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WindowedIngest

/** Property-based invariants (SURVEY §5.3) for the pure planning/
  * numeric logic — no SparkSession needed, so these run in
  * milliseconds and explore the input space instead of fixed fixtures.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val dates = Gen.choose(0L, 20000L).map(LocalDate.ofEpochDay)

  test("monthly windows tile [start, end] exactly: no gaps, no overlap, full cover") {
    check(Prop.forAll(dates, Gen.choose(0L, 1500L)) { (start, span) =>
      val end = start.plusDays(span)
      val ws = WindowedIngest.monthlyWindows(start, end)
      val tiles = ws.sliding(2).forall {
        case Seq(a, b) => a.endInclusive.plusDays(1) == b.start
        case _ => true
      }
      val withinMonth = ws.forall(w =>
        w.start.getMonth == w.endInclusive.getMonth && w.start.getYear == w.endInclusive.getYear &&
          !w.endInclusive.isBefore(w.start)
      )
      ws.head.start == start && ws.last.endInclusive == end && tiles && withinMonth
    })
  }

  test("minhash params: in range, nonzero slope, pairwise distinct") {
    check(Prop.forAll(Gen.choose(1, 64)) { k =>
      val ps = graft.operators.NearDup.minhashParams(k)
      ps.size == k &&
      ps.forall { case (a, b) =>
        a > 0 && a < graft.operators.NearDup.MinhashPrime && b >= 0 && b < graft.operators.NearDup.MinhashPrime
      } &&
      ps.distinct.size == k
    })
  }

  test("MinHashSigAggregator: merge commutative + equals single-pass signature") {
    val agg = new graft.functions.MinHashSigAggregator(8)
    val hashes = Gen.listOfN(20, Gen.choose(0L, Int.MaxValue.toLong * 2))
    def sig(vals: List[Long]) = vals.foldLeft(agg.zero.clone)(agg.reduce)
    check(Prop.forAll(hashes, hashes) { (xs, ys) =>
      val ab = agg.merge(sig(xs), sig(ys)).toSeq
      val ba = agg.merge(sig(ys), sig(xs)).toSeq
      ab == ba && ab == sig(xs ++ ys).toSeq
    })
  }

  test("retry: succeeds iff failures < maxAttempts; sleeps (attempts-1) backoffs") {
    check(Prop.forAll(Gen.choose(0, 10), Gen.choose(1, 8)) { (failures, maxAttempts) =>
      var n = 0
      var sleeps = 0
      val policy = graft.sinks.RetryingSink.RetryPolicy(maxAttempts, backoffMillis = 1L)
      val attempt = () => { n += 1; if (n <= failures) sys.error("down") else "ok" }
      if (failures < maxAttempts) {
        val (v, used) = graft.sinks.RetryingSink.withRetry(policy, _ => sleeps += 1)(attempt)
        v == "ok" && used == failures + 1 && sleeps == failures
      } else {
        val threw =
          try { graft.sinks.RetryingSink.withRetry(policy, _ => sleeps += 1)(attempt); false }
          catch { case _: RuntimeException => true }
        threw && sleeps == maxAttempts - 1
      }
    })
  }

  test("DailySchedule.nextRun strictly after now, lands on target time, within a day") {
    check(Prop.forAll(Gen.choose(0L, 2000000000L), Gen.choose(0, 23), Gen.choose(0, 59)) { (epochSec, h, m) =>
      val now = java.time.LocalDateTime.ofEpochSecond(epochSec, 0, java.time.ZoneOffset.UTC)
      val at = java.time.LocalTime.of(h, m)
      val next = graft.pipeline.DailySchedule.nextRun(now, at)
      next.isAfter(now) && next.toLocalTime == at && !next.toLocalDate.isAfter(now.toLocalDate.plusDays(1))
    })
  }

  test("roundAway reference semantics: |r - x| <= half-ulp-of-scale, half goes away from zero") {
    check(Prop.forAll(Gen.choose(-1000000, 1000000), Gen.oneOf(2, 4, 6)) { (milli, s) =>
      val x = milli / 1000.0
      val p = math.pow(10, s)
      val r = math.signum(x) * (math.floor(math.abs(x) * p + 0.5) / p)
      math.abs(r - x) <= 0.5 / p + 1e-12
    })
  }
}
