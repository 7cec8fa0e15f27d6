package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming surface (SURVEY §2.10): the reference pushes typed progress
  * events over WebSocket (`server.py:110-122`); the engine's analog is an
  * `events` table/stream processed with Structured Streaming — watermarked
  * tumbling-window aggregation for live dashboards, and
  * `flatMapGroupsWithState` sessionization as the custom-state example.
  */
object EventStream {

  /** Engine progress-event schema (FIXTURES.md §5). */
  val EventSchema: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("ts", TimestampType),
    StructField("agent_id", StringType),
    StructField("task_id", IntegerType),
    StructField("query_id", LongType),
    StructField("data", StringType)))

  /** Testdata `events` stream schema (ts read as µs timestamp here — the
    * streaming reader is fed converted batches in tests). */
  val RawEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(RawEventSchema).parquet(dir)

  /** Watermarked tumbling-window counts per event type. `exactSum`
    * switches the value sum to the round(,6)→DECIMAL(22,6) idiom —
    * associative, so the result is bit-identical on any partitioning
    * and replayable by a SQL oracle (q201); the default double sum is
    * the production form (cheaper, last-ulp order-dependent). */
  def windowedCounts(events: DataFrame,
                     window_ : String = "5 minutes",
                     watermark: String = "10 minutes",
                     exactSum: Boolean = false): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (if (exactSum)
          sum(round(col("value"), 6).cast("decimal(22,6)")).cast("double")
        else sum("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("n"), col("sum_value"))

  /** SLIDING (hopping) watermarked window counts — q201's tumbling
    * aggregation with overlap: each event lands in `window/slide`
    * concurrent windows, so state size and update fan-out scale by the
    * overlap factor (the knob a dashboard trades smoothness against
    * state for; tumbling is the slide = window special case). Same
    * exact-sum option as [[windowedCounts]]. */
  def slidingCounts(events: DataFrame,
                    window_ : String, slide: String, watermark: String,
                    exactSum: Boolean = false): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (if (exactSum)
          sum(round(col("value"), 6).cast("decimal(22,6)")).cast("double")
        else sum("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("n"), col("sum_value"))

  final case class RawEvent(event_id: Long, ts: java.sql.Timestamp,
                            user_id: Long, event_type: String,
                            value: Double, props: String)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
                               session_end: java.sql.Timestamp, n_events: Int)

  /** Streaming-ingest exact dedup (the ST4 write-back path at stream
    * granularity): drop any document whose content fingerprint was already
    * seen, with a watermark bounding the dedup state — the standard
    * streaming posture for "append only novel documents to the corpus".
    * State size is one fingerprint per distinct document inside the
    * watermark horizon; an unbounded horizon (`withEventTimeWatermark`
    * omitted) would grow state forever at 100 TB ingest rates, so the
    * watermark column+delay are required parameters, not defaults. */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermarkDelay: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // dropDuplicatesWithinWatermark, NOT dropDuplicates("fp"): with a plain
    // dropDuplicates on a non-event-time subset the watermark never expires
    // dedup state (one entry per distinct fingerprint, forever). The
    // WithinWatermark variant evicts each fingerprint once it falls behind
    // the watermark — bounded state, the whole point of the required
    // watermark parameters.
    docs
      .withColumn("fp", graft.operators.TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")
  }

  /** Fold a batch of event times into the prior session list,
    * ORDER-INSENSITIVELY: every event opens a singleton session, the lot is
    * sorted by start, and chronologically-adjacent sessions within `gapMs`
    * merge. This keeps the gap invariant for cross-batch late events in
    * both directions — a late event just inside the open session's span
    * merges into it, while one more than `gapMs` BEFORE its start forms
    * its own (immediately closed) session instead of silently stretching
    * the session across a silence longer than the gap (the bug an
    * append-at-the-tail fold has). Returns (closed, stillOpen) — only the
    * chronologically-last session stays open. */
  private[graft] def foldSessions(prior: List[SessionState], incoming: Seq[Long],
                                  gapMs: Long): (Seq[SessionState], List[SessionState]) = {
    val all = (prior ++ incoming.map(t => SessionState(t, t, 1))).sortBy(_.start)
    val merged = scala.collection.mutable.ArrayBuffer.empty[SessionState]
    all.foreach { s =>
      merged.lastOption match {
        case Some(p) if s.start - p.last <= gapMs =>
          merged(merged.length - 1) =
            SessionState(p.start, math.max(p.last, s.last), p.n + s.n)
        case _ => merged += s
      }
    }
    if (merged.isEmpty) (Seq.empty, List.empty)
    else (merged.init.toSeq, List(merged.last))
  }

  private def emit(userId: Long, ss: Iterable[SessionState]): Iterator[UserSession] =
    ss.iterator.map(s => UserSession(userId,
      new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.n))

  /** Custom-state sessionization: a user's session closes after
    * `gapMinutes` of inactivity. NoTimeout variant — the open tail session
    * only flushes when a later event for the same user arrives (or at
    * batch end in tests); fine for batch parity and bounded inputs, wrong
    * for a long-running stream where idle users would hold state forever —
    * use [[sessionizeEventTime]] there. */
  def sessionize(events: Dataset[RawEvent], gapMinutes: Int = 30): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], UserSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[RawEvent], state: GroupState[List[SessionState]]) =>
          val (closed, open) = foldSessions(state.getOption.getOrElse(Nil),
            rows.map(_.ts.getTime).toSeq.sorted, gapMs)
          state.update(open)
          emit(userId, closed)
      }
  }

  final case class SessionTypes(user_id: Long, session_start: java.sql.Timestamp,
                                session_end: java.sql.Timestamp,
                                n_events: Int, n_types: Int)

  /** Sessionization with per-session distinct-type counts over the NEW
    * arbitrary-state API (`transformWithState`, Spark 4.x) — the sixth
    * stateful streaming family: typed `ValueState` for the open
    * session's bounds, `ListState` for the event types it has seen, and
    * EXPLICIT event-time timers (register/delete per update) instead of
    * `GroupState.setTimeoutTimestamp`. Semantics match
    * [[sessionizeEventTime]]'s gap rule exactly (a session closes after
    * `gapMinutes` of event-time silence; the close emits via the timer
    * path once the watermark passes last+gap), so the batch oracle is
    * the q195 session fold extended with `count(DISTINCT event_type)`.
    * Requires the RocksDB state store provider (the only provider that
    * backs transformWithState) — gates set it per-run.
    *
    * In-batch rows are folded in (ts, event_id) order; an in-batch gap
    * splits the session immediately (emitted from `handleInputRows`),
    * the open tail waits on its timer. State per key is one bounds
    * tuple + the open session's distinct types — bounded by the active
    * user set inside the watermark horizon, the [[sessionizeEventTime]]
    * posture carried to the new API. */
  class SessionStatsProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, RawEvent, SessionTypes] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
      OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var open: ValueState[SessionState] = _
    @transient private var types: ListState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState[SessionState]("open",
        Encoders.product[SessionState], TTLConfig.NONE)
      types = getHandle.getListState[String]("types",
        Encoders.STRING, TTLConfig.NONE)
    }

    private def emitSess(userId: Long, s: SessionState,
                         tset: Set[String]): SessionTypes =
      SessionTypes(userId, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.last), s.n, tset.size)

    override def handleInputRows(userId: Long, rows: Iterator[RawEvent],
                                 timerValues: TimerValues): Iterator[SessionTypes] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var cur: Option[SessionState] =
        if (open.exists()) Some(open.get()) else None
      var tset: Set[String] = if (cur.isDefined) types.get().toSet else Set.empty
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionTypes]
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last <= gapMs =>
            cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1))
            tset += e.event_type
          case Some(s) =>
            out += emitSess(userId, s, tset)
            cur = Some(SessionState(t, t, 1)); tset = Set(e.event_type)
          case None =>
            cur = Some(SessionState(t, t, 1)); tset = Set(e.event_type)
        }
      }
      cur.foreach { s =>
        open.update(s)
        types.clear(); tset.toSeq.sorted.foreach(types.appendValue)
        // re-arm the close timer: explicit delete+register (the new
        // API's contract — timers are per-key values, not a slot), at
        // or after the current watermark or the timer could never fire
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(
          math.max(s.last + gapMs, timerValues.getCurrentWatermarkInMs() + 1))
      }
      out.iterator
    }

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionTypes] = {
      val out = if (open.exists())
        Iterator.single(emitSess(userId, open.get(), types.get().toSet))
      else Iterator.empty
      open.clear(); types.clear()
      out
    }
  }

  /** [[SessionStatsProcessor]] wired to a raw event stream: watermark,
    * key by user, transformWithState in event-time mode, append output. */
  def sessionStatsTws(events: Dataset[RawEvent], gapMinutes: Int = 30,
                      watermarkDelay: String = "10 minutes"): Dataset[SessionTypes] = {
    val spark = events.sparkSession
    import org.apache.spark.sql.streaming.TimeMode
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionStatsProcessor(gapMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Event-time-timeout sessionization — the long-running-stream variant of
    * [[sessionize]]: each update arms a timeout at last_event + gap, and
    * when the WATERMARK passes it Spark invokes the group with
    * `hasTimedOut` and no rows, so an idle user's open session closes and
    * its state is freed WITHOUT any new input for that user. This is the
    * production posture: state stays bounded by the active-user set inside
    * the watermark horizon, not by every user ever seen. */
  def sessionizeEventTime(events: Dataset[RawEvent], gapMinutes: Int = 30,
                          watermarkDelay: String = "10 minutes"): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[RawEvent], state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            val open = state.getOption.getOrElse(Nil)
            state.remove()
            emit(userId, open)
          } else {
            val (closed, open) = foldSessions(state.getOption.getOrElse(Nil),
              rows.map(_.ts.getTime).toSeq.sorted, gapMs)
            state.update(open)
            // The timeout must sit at-or-after the current watermark, or
            // Spark rejects it — clamp for sessions already behind it.
            open.foreach(s => state.setTimeoutTimestamp(
              math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1)))
            emit(userId, closed)
          }
      }
  }
}
