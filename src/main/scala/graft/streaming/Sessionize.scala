package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Custom-state streaming: sessionize an event stream per user with an
  * inactivity gap, via `flatMapGroupsWithState` — the engine's
  * stateful-streaming surface (the reference has no streaming state;
  * this is the north-star capability SURVEY §2.8 points to beyond its
  * daily re-pull loop).
  *
  * State is one open session per user (start, last-seen, count, cent
  * sum); an event more than `gapMillis` after last-seen closes the
  * session and emits it. Open sessions stay in state (an available-now
  * run emits only CLOSED sessions — exactly what the gaps-and-islands
  * SQL oracle computes). State is per-key and partitioned by user: at
  * cluster scale it shards across executors with no driver involvement.
  *
  * Exactness notes: money sums accumulate as integer cents (double
  * accumulation order would differ from the oracle's decimal sum at the
  * ulp level); timestamps surface as epoch millis (DuckDB `epoch_ms`
  * truncates micros the same way `Timestamp.getTime` does).
  */
object Sessionize {

  final case class Event(event_id: Long, user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(startMs: Long, lastSeenMs: Long, nEvents: Long, cents: Long)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long, sum_value: Double)

  private def cents(v: Double): Long = math.round(v * 100.0)

  /** Memory bound: this buffers and sorts ONE user's events from ONE
    * micro-batch (Spark hands groups as iterators in arbitrary order,
    * and sessionization needs time order). Per-user-per-batch volume is
    * session-sized in practice, but it is the operator's only unbounded
    * buffer — a pathological hot key in a single batch lands in one
    * task's heap. At scale, bound it upstream: cap batch size via
    * `maxFilesPerTrigger`/`maxOffsetsPerTrigger`, or pre-aggregate the
    * hot key (the Salting pattern) before the stateful stage.
    */
  def sessionizeFn(gapMillis: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]
  ): Iterator[Session] = {
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    var cur = state.getOption
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.lastSeenMs > gapMillis =>
          out += Session(userId, s.startMs, s.lastSeenMs, s.nEvents, s.cents / 100.0)
          cur = Some(SessionState(t, t, 1L, cents(e.value)))
        case Some(s) =>
          cur = Some(SessionState(s.startMs, t, s.nEvents + 1, s.cents + cents(e.value)))
        case None =>
          cur = Some(SessionState(t, t, 1L, cents(e.value)))
      }
    }
    cur.foreach(state.update)
    out.iterator
  }

  /** Run sessionization over the static events table through the
    * streaming engine (available-now) and return closed sessions.
    */
  def run(spark: SparkSession, dir: String, gapMinutes: Int): Dataset[Session] = {
    StateConf.withStatePartitions(spark, 8) {
      import spark.implicits._
      val raw = graft.sources.Tables.eventsStream(spark, dir)
      val events = raw
        .select(col("event_id"), col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
        .as[Event]
      val sessions = events
        .groupByKey(_.user_id)
        // NoTimeout: open sessions remain in state (never emitted), which
        // is the closed-sessions contract; a processing-time timeout would
        // keep the available-now query alive running empty batches until
        // the wall-clock gap elapsed
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
          sessionizeFn(gapMinutes * 60000L)
        )
      val name = s"graft_sessions_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = sessions.writeStream
        .outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally q.stop()
      spark.table(name).as[Session]
    }
  }
}
