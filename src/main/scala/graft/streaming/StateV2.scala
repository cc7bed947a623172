package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  OutputMode,
  StatefulProcessor,
  TTLConfig,
  TimeMode,
  TimerValues,
  Trigger,
  ValueState
}

/** Arbitrary stateful streaming via the v2 state API
  * (`transformWithState`, Spark 4): per-user lifetime counters held in
  * a named `ValueState` cell on the RocksDB state store — the API that
  * supersedes `flatMapGroupsWithState` (q37) with composable named
  * state variables, per-variable TTL, and timers.
  *
  * Design for 100 TB of events:
  *   - State is ONE fixed-size row per user (five longs), keyed and
  *     executor-sharded by the stream's hash partitioning; RocksDB
  *     keeps it off-heap with incremental snapshots, so state volume
  *     is bounded by |users|, not |events|.
  *   - Every counter is an order-independent merge (count, sum,
  *     min, max) — emission is deterministic whatever the micro-batch
  *     layout, and restart-safe because the state cell IS the partial.
  *   - The processor emits the RUNNING row each time a batch touches a
  *     key (Update mode); the caller keeps each user's final row with
  *     the engine's own argmax dedup — so the result is identical
  *     whether available-now ran one batch or fifty.
  *   - Money accumulates as integer cents (`floor(v·100 + 0.5)` —
  *     exact IEEE ops, same bits on every engine), the q37 lesson.
  */
object StateV2 {

  final case class Ev(event_id: Long, user_id: Long, ts_ms: Long, cents: Long, is_purchase: Long)
  final case class UserAgg(n_events: Long, sum_cents: Long, first_ms: Long, last_ms: Long, n_purchase: Long)
  final case class UserRow(
      user_id: Long,
      n_events: Long,
      sum_cents: Long,
      first_ms: Long,
      last_ms: Long,
      n_purchase: Long
  )

  /** Five lifetime counters in a single ValueState cell. */
  class LifetimeStats extends StatefulProcessor[Long, Ev, UserRow] {
    @transient private var st: ValueState[UserAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[UserAgg]("agg", Encoders.product[UserAgg], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev], timers: TimerValues): Iterator[UserRow] = {
      var s =
        if (st.exists()) st.get()
        else UserAgg(0L, 0L, Long.MaxValue, Long.MinValue, 0L)
      rows.foreach { e =>
        s = UserAgg(
          s.n_events + 1L,
          s.sum_cents + e.cents,
          math.min(s.first_ms, e.ts_ms),
          math.max(s.last_ms, e.ts_ms),
          s.n_purchase + e.is_purchase
        )
      }
      st.update(s)
      Iterator.single(UserRow(key, s.n_events, s.sum_cents, s.first_ms, s.last_ms, s.n_purchase))
    }
  }

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Event-time-timer sessionization — the v2 API's marquee feature
    * over q37's `flatMapGroupsWithState`: instead of open sessions
    * sitting in state forever (q37's NoTimeout contract), each key
    * re-arms ONE timer at last-seen + gap; when the WATERMARK passes
    * it, `handleExpiredTimer` emits the session and clears the state.
    * In-batch closures (a later event > gap after) emit immediately,
    * exactly like q37. Under available-now the engine runs a final
    * no-data micro-batch after the watermark advances, so sessions
    * whose (end + gap) ≤ final watermark close DETERMINISTICALLY —
    * the emitted set replays as: all islands closed by a successor,
    * plus last islands with end + gap ≤ (ms-floored max event time −
    * delay), which is precisely what the oracle computes (the q133
    * watermark-replay discipline). At 100 TB this is how streaming
    * session state stays bounded: the timer IS the eviction policy.
    */
  class SessionTimers(gapMs: Long) extends StatefulProcessor[Long, Sessionize.Event, Sessionize.Session] {
    @transient private var st: ValueState[Sessionize.SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Sessionize.SessionState](
        "session",
        Encoders.product[Sessionize.SessionState],
        TTLConfig.NONE
      )

    override def handleInputRows(
        key: Long,
        rows: Iterator[Sessionize.Event],
        timers: TimerValues
    ): Iterator[Sessionize.Session] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[Sessionize.Session]
      var cur = if (st.exists()) Option(st.get()) else None
      sorted.foreach { e =>
        val t = e.ts.getTime
        val cents = math.round(e.value * 100.0)
        cur match {
          case Some(s) if t - s.lastSeenMs > gapMs =>
            out += Sessionize.Session(key, s.startMs, s.lastSeenMs, s.nEvents, s.cents / 100.0)
            cur = Some(Sessionize.SessionState(t, t, 1L, cents))
          case Some(s) =>
            cur = Some(Sessionize.SessionState(s.startMs, t, s.nEvents + 1, s.cents + cents))
          case None =>
            cur = Some(Sessionize.SessionState(t, t, 1L, cents))
        }
      }
      cur.foreach(st.update)
      // exactly one live timer per key: re-arm at last-seen + gap
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      cur.foreach(s => getHandle.registerTimer(s.lastSeenMs + gapMs))
      out.iterator
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo
    ): Iterator[Sessionize.Session] =
      if (st.exists()) {
        val s = st.get()
        st.clear()
        Iterator.single(Sessionize.Session(key, s.startMs, s.lastSeenMs, s.nEvents, s.cents / 100.0))
      } else Iterator.empty
  }

  /** Run timer-closed sessionization (gap 12 h, watermark delay 1 h)
    * over the static events table through available-now.
    */
  def timerSessions(spark: SparkSession, dir: String): DataFrame = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      StateConf.withStatePartitions(spark, 8) {
        import spark.implicits._
        val events = graft.sources.Tables
          .eventsStream(spark, dir)
          .select(col("event_id"), col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
          .withWatermark("ts", "1 hour")
          .as[Sessionize.Event]
        val sessions = events
          .groupByKey(_.user_id)
          .transformWithState(
            new SessionTimers(12L * 3600 * 1000),
            TimeMode.EventTime(),
            OutputMode.Append()
          )
        val name = s"graft_timersess_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val q = sessions.writeStream
          .outputMode("append")
          .format("memory")
          .queryName(name)
          .trigger(Trigger.AvailableNow())
          .start()
        try q.awaitTermination()
        finally q.stop()
        spark
          .table(name)
          .select("user_id", "start_ms", "end_ms", "n_events", "sum_value")
          .orderBy("user_id", "start_ms")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  /** Run the lifetime-stats processor over the static events table
    * through the streaming engine (available-now, RocksDB provider —
    * transformWithState requires it) and keep each user's final row.
    */
  def lifetimeStats(spark: SparkSession, dir: String): DataFrame = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      StateConf.withStatePartitions(spark, 8) {
        import spark.implicits._
        val evs = graft.sources.Tables
          .eventsStream(spark, dir)
          .select(
            col("event_id"),
            col("user_id"),
            expr("unix_millis(ts)").as("ts_ms"),
            // null-valued events contribute 0 cents (the oracle's
            // COALESCE mirror) but still count as events
            coalesce(floor(col("value") * 100 + 0.5).cast("long"), lit(0L)).as("cents"),
            (col("event_type") === "purchase").cast("long").as("is_purchase")
          )
          .as[Ev]
        val rows = evs
          .groupByKey(_.user_id)
          .transformWithState(new LifetimeStats, TimeMode.None(), OutputMode.Update())
        val name = s"graft_statev2_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val q = rows.writeStream
          .outputMode("update")
          .format("memory")
          .queryName(name)
          .trigger(Trigger.AvailableNow())
          .start()
        try q.awaitTermination()
        finally q.stop()
        // one emission per touched key per batch: the final row is the
        // one with the largest running count (monotone per key)
        graft.operators.Dedup
          .keepOnePerKey(
            spark.table(name),
            key = Seq(col("user_id")),
            order = Seq(col("n_events").desc)
          )
          .select("user_id", "n_events", "sum_cents", "first_ms", "last_ms", "n_purchase")
          .orderBy("user_id")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }
}
