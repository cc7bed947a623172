package graft.pipeline

import java.time.{Duration, LocalDateTime, LocalTime}

import org.scalatest.funsuite.AnyFunSuite

class DailyScheduleSpec extends AnyFunSuite {

  private val at = LocalTime.of(1, 30) // the reference's 01:30 (app.py:50)

  test("nextRun: before today's slot → today; after → tomorrow") {
    val before = LocalDateTime.of(2026, 8, 12, 0, 0)
    assert(DailySchedule.nextRun(before, at) === LocalDateTime.of(2026, 8, 12, 1, 30))
    val after = LocalDateTime.of(2026, 8, 12, 2, 0)
    assert(DailySchedule.nextRun(after, at) === LocalDateTime.of(2026, 8, 13, 1, 30))
  }

  test("loop: fires daily, sleeps the exact gap, bounded by maxRuns") {
    var now = LocalDateTime.of(2026, 8, 12, 0, 0)
    val slept = scala.collection.mutable.ArrayBuffer.empty[Duration]
    val fired = scala.collection.mutable.ArrayBuffer.empty[LocalDateTime]
    val runs = DailySchedule.loop(
      at,
      clock = () => now,
      sleep = d => { slept += d; now = now.plus(d) },
      action = t => fired += t,
      maxRuns = Some(3)
    )
    assert(runs === 3)
    assert(fired.toSeq === Seq(
      LocalDateTime.of(2026, 8, 12, 1, 30),
      LocalDateTime.of(2026, 8, 13, 1, 30),
      LocalDateTime.of(2026, 8, 14, 1, 30)
    ))
    assert(slept.head === Duration.ofMinutes(90))
    assert(slept.tail.forall(_ === Duration.ofDays(1)))
  }
}
