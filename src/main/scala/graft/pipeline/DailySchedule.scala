package graft.pipeline

import java.time.{Duration, LocalDateTime, LocalTime}

/** Driver-side daily scheduler — the faithful port of the reference's
  * `@repeat(every().day.at("01:30"))` + busy-wait loop
  * (`app.py:50, 991-995`). Kept deliberately outside the engine: the
  * idiomatic Spark upgrade is Structured Streaming
  * `Trigger.AvailableNow` ([[graft.streaming.StreamAgg]]); this loop
  * exists for batch-cron parity. Clock and sleep are injectable for
  * tests.
  */
object DailySchedule {

  /** First run instant strictly after `now` at wall time `at`. */
  def nextRun(now: LocalDateTime, at: LocalTime): LocalDateTime = {
    val today = now.toLocalDate.atTime(at)
    if (today.isAfter(now)) today else today.plusDays(1)
  }

  /** Run `action` every day at `at`, `maxRuns` times (None = forever).
    * Returns the number of runs performed.
    */
  def loop(
      at: LocalTime,
      clock: () => LocalDateTime,
      sleep: Duration => Unit,
      action: LocalDateTime => Unit,
      maxRuns: Option[Int] = None
  ): Int = {
    var runs = 0
    while (maxRuns.forall(runs < _)) {
      val now = clock()
      val next = nextRun(now, at)
      sleep(Duration.between(now, next))
      action(next)
      runs += 1
    }
    runs
  }
}
