package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  OutputMode,
  StatefulProcessor,
  StatefulProcessorWithInitialState,
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
    * whose (end + gap) < final watermark close DETERMINISTICALLY —
    * the comparison is STRICT: TimerBoundaryProbe showed a timer whose
    * expiry equals the eviction watermark does NOT fire. The emitted
    * set replays as: all islands closed by a successor, plus last
    * islands with end + gap < (ms-floored max event time − delay),
    * which is precisely what the oracle computes (the q133
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
            // merge guard: a later micro-batch may deliver an event with
            // t < lastSeenMs (cross-batch disorder inside the watermark);
            // min/max keep the island's bounds order-independent instead
            // of letting a late arrival move lastSeenMs backwards
            cur = Some(
              Sessionize.SessionState(
                math.min(s.startMs, t),
                math.max(s.lastSeenMs, t),
                s.nEvents + 1,
                s.cents + cents
              )
            )
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

  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** MapState: per-user map event_type → count. Each touched key emits
    * its full map each batch (counts are monotone per entry, so the
    * final row per (user, type) is the max — the q213 dedup rule). The
    * map is domain-sized per user (≤ |event types| entries), the
    * canonical MapState shape: point lookups and single-entry updates
    * instead of deserializing a whole per-key blob (what ValueState of
    * a Map would cost) — on RocksDB each entry is its own KV pair.
    */
  class TypeCounts extends StatefulProcessor[Long, Ev2, TypeCount] {
    @transient private var st: org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getMapState[String, Long](
        "counts",
        Encoders.STRING,
        Encoders.scalaLong,
        TTLConfig.NONE
      )

    override def handleInputRows(key: Long, rows: Iterator[Ev2], timers: TimerValues): Iterator[TypeCount] = {
      rows.foreach { e =>
        val cur = if (st.containsKey(e.event_type)) st.getValue(e.event_type) else 0L
        st.updateValue(e.event_type, cur + 1L)
      }
      st.iterator().map { case (t, n) => TypeCount(key, t, n) }
    }
  }

  final case class Ev2(user_id: Long, event_type: String)
  final case class EarlyEv(user_id: Long, rnk: Int, event_id: Long, ts_ms: Long)

  /** ListState: the earliest 3 events per user. The state list is
    * REWRITTEN each batch as the sorted-truncated merge of (state ∪
    * batch) — an order-independent fold, so the emitted k-set only
    * ever improves toward the true earliest-k whatever the micro-batch
    * layout; the final row per (user, rank) is the lexicographic min
    * (the dedup rule below). Bounded state by construction: k rows per
    * key, ever — the ListState shape for "keep a small top-k per key"
    * streaming state.
    */
  class EarliestK(k: Int) extends StatefulProcessor[Long, Ev, EarlyEv] {
    @transient private var st: org.apache.spark.sql.streaming.ListState[EarlyEv] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[EarlyEv]("early", Encoders.product[EarlyEv], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev], timers: TimerValues): Iterator[EarlyEv] = {
      val prev = if (st.exists()) st.get().toSeq else Seq.empty
      val merged = (prev ++ rows.map(e => EarlyEv(key, 0, e.event_id, e.ts_ms)))
        .sortBy(e => (e.ts_ms, e.event_id))
        .take(k)
        .zipWithIndex
        .map { case (e, i) => e.copy(rnk = i + 1) }
      st.put(merged.toArray)
      merged.iterator
    }
  }

  /** Run the MapState type counter; final row per (user, type) = max n. */
  def typeCounts(spark: SparkSession, dir: String): DataFrame =
    runAvailableNow(spark) {
      import spark.implicits._
      graft.sources.Tables
        .eventsStream(spark, dir)
        .select(col("user_id"), col("event_type"))
        .as[Ev2]
        .groupByKey(_.user_id)
        .transformWithState(new TypeCounts, TimeMode.None(), OutputMode.Update())
    } { t =>
      graft.operators.Dedup
        .keepOnePerKey(t, key = Seq(col("user_id"), col("event_type")), order = Seq(col("n").desc))
        .orderBy("user_id", "event_type")
    }

  /** Run the ListState earliest-3; final row per (user, rank) = lex min. */
  def earliestEvents(spark: SparkSession, dir: String): DataFrame =
    runAvailableNow(spark) {
      import spark.implicits._
      graft.sources.Tables
        .eventsStream(spark, dir)
        .select(
          col("event_id"),
          col("user_id"),
          expr("unix_millis(ts)").as("ts_ms"),
          lit(0L).as("cents"),
          lit(0L).as("is_purchase")
        )
        .as[Ev]
        .groupByKey(_.user_id)
        .transformWithState(new EarliestK(3), TimeMode.None(), OutputMode.Update())
    } { t =>
      graft.operators.Dedup
        .keepOnePerKey(t, key = Seq(col("user_id"), col("rnk")), order = Seq(col("ts_ms"), col("event_id")))
        .orderBy("user_id", "rnk")
    }

  /** Warm-start variant: lifetime stats whose state is BOOTSTRAPPED
    * from a batch-computed snapshot (`handleInitialState`) before the
    * stream runs — the migration path from a batch pipeline to
    * streaming, and the recovery path when a checkpoint is lost but
    * yesterday's aggregate table survives. Here the "snapshot" is the
    * even-event_id half aggregated in batch; the stream replays only
    * the odd half; the final rows must equal the full-table aggregate
    * (q213's oracle, shared verbatim) — state bootstrap + incremental
    * merge ≡ recompute, the q209 invariant lifted into streaming.
    */
  class LifetimeStatsWithInit extends StatefulProcessorWithInitialState[Long, Ev, UserRow, UserAgg] {
    @transient private var st: ValueState[UserAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[UserAgg]("agg", Encoders.product[UserAgg], TTLConfig.NONE)

    override def handleInitialState(key: Long, initial: UserAgg, timers: TimerValues): Unit =
      st.update(initial)

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

  /** Run warm-started lifetime stats: batch snapshot of the even half,
    * streamed replay of the odd half; result = the full aggregate.
    */
  def lifetimeStatsWarmStart(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def evCols(df: DataFrame) = df.select(
      col("event_id"),
      col("user_id"),
      expr("unix_millis(ts)").as("ts_ms"),
      coalesce(floor(col("value") * 100 + 0.5).cast("long"), lit(0L)).as("cents"),
      (col("event_type") === "purchase").cast("long").as("is_purchase")
    )
    val cols = Seq("user_id", "n_events", "sum_cents", "first_ms", "last_ms", "n_purchase")
    val snapshotDf = evCols(graft.sources.Tables.parquet(spark, dir, "events"))
      .filter(col("event_id") % 2 === 0)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("sum_cents"),
        min(col("ts_ms")).as("first_ms"),
        max(col("ts_ms")).as("last_ms"),
        sum(col("is_purchase")).as("n_purchase")
      )
    val snapshot = snapshotDf
      .as[UserRow]
      .groupByKey(_.user_id)
      .mapValues(r => UserAgg(r.n_events, r.sum_cents, r.first_ms, r.last_ms, r.n_purchase))
    runAvailableNow(spark) {
      evCols(graft.sources.Tables.eventsStream(spark, dir))
        .filter(col("event_id") % 2 =!= 0)
        .as[Ev]
        .groupByKey(_.user_id)
        .transformWithState(
          new LifetimeStatsWithInit,
          TimeMode.None(),
          OutputMode.Update(),
          snapshot
        )
    } { t =>
      val streamed = graft.operators.Dedup
        .keepOnePerKey(t, key = Seq(col("user_id")), order = Seq(col("n_events").desc))
        .select(cols.map(col): _*)
      // bootstrap-only keys: a user whose events are ALL in the batch
      // snapshot gets state via handleInitialState but never a streamed
      // row, so handleInputRows never emits it — fall back to the
      // snapshot aggregate for exactly those keys (an anti-join of the
      // request-sized snapshot against the emitted set), so warm start
      // still equals the full recompute whatever the key split.
      // Data-dependent today (every test user has an odd event) but a
      // correctness hole at any other split — round-5 advice item.
      val bootstrapOnly = snapshotDf
        .join(streamed.select("user_id"), Seq("user_id"), "left_anti")
        .select(cols.map(col): _*)
      streamed.unionByName(bootstrapOnly).orderBy("user_id")
    }
  }

  /** GENUINELY multi-batch replay of the lifetime counters: the events
    * table is split into four deterministic chunk FILES (event_id % 4,
    * one parquet file each in a scratch dir) and streamed with
    * `maxFilesPerTrigger = 1`, so available-now really runs ≥4
    * micro-batches and every cross-batch state-merge path executes —
    * the single-file test data otherwise collapses all streaming
    * queries into one batch (round-5 advice), leaving "order-
    * independent merge" claims unexercised. The runner REQUIRES the
    * multi-batch property at runtime (deterministic data ⇒ always
    * true; a regression to one batch fails loudly rather than
    * silently weakening the test). Result must equal the full batch
    * aggregate — the same oracle as q213/q228, now proven under a
    * partitioned replay instead of a monolithic one.
    */
  def lifetimeStatsMultiBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scratch = graft.operators.Scratch.dir("graft-multibatch")
    val ev = graft.sources.Tables.events(spark, dir)
    (0 to 3).foreach { i =>
      ev.filter(col("event_id") % 4 === i).coalesce(1).write.mode("overwrite").parquet(s"$scratch/chunk$i")
    }
    val schema = spark.read.parquet(s"$scratch/chunk0").schema
    var batches = 0L
    val out = runAvailableNowObserved(spark) {
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(scratch)
        .select(
          col("event_id"),
          col("user_id"),
          expr("unix_millis(ts)").as("ts_ms"),
          coalesce(floor(col("value") * 100 + 0.5).cast("long"), lit(0L)).as("cents"),
          (col("event_type") === "purchase").cast("long").as("is_purchase")
        )
        .as[Ev]
        .groupByKey(_.user_id)
        .transformWithState(new LifetimeStats, TimeMode.None(), OutputMode.Update())
    } { t =>
      graft.operators.Dedup
        .keepOnePerKey(t, key = Seq(col("user_id")), order = Seq(col("n_events").desc))
        .select("user_id", "n_events", "sum_cents", "first_ms", "last_ms", "n_purchase")
        .orderBy("user_id")
    } { q => batches = q.recentProgress.count(_.numInputRows > 0).toLong }
    require(batches >= 4, s"multi-batch replay degenerated to $batches data batches")
    out
  }

  /** Shared runner: RocksDB provider + 8 state partitions + available-
    * now through a memory sink; `finish` post-processes the emitted
    * table (the per-batch emissions) into the final frame.
    */
  private def runAvailableNowObserved(
      spark: SparkSession
  )(build: => org.apache.spark.sql.Dataset[_])(finish: DataFrame => DataFrame)(
      observe: org.apache.spark.sql.streaming.StreamingQuery => Unit
  ): DataFrame = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      StateConf.withStatePartitions(spark, 8) {
        val rows = build
        val name = s"graft_statev2_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val q = rows.writeStream
          .outputMode("update")
          .format("memory")
          .queryName(name)
          .trigger(Trigger.AvailableNow())
          .start()
        try {
          q.awaitTermination()
          observe(q)
        } finally q.stop()
        finish(spark.table(name))
      }
    } finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private def runAvailableNow(
      spark: SparkSession
  )(build: => org.apache.spark.sql.Dataset[_])(finish: DataFrame => DataFrame): DataFrame =
    runAvailableNowObserved(spark)(build)(finish)(_ => ())

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
