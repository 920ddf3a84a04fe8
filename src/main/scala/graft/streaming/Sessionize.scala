package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful sessionization over the events stream via
  * flatMapGroupsWithState — the custom-state streaming surface
  * (SURVEY §2.10 extension; the batch-window ops cover the rest).
  *
  * A session closes when a user is idle for longer than `gapSeconds`;
  * each closed session emits (user_id, start, end, n_events, total_value).
  */
object Sessionize {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  // value accumulated in exact integer cents so the streaming and batch
  // paths agree bit-for-bit
  final case class SessionState(start: Long, last: Long, n: Long,
      cents: Long)

  final case class Session(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long, total_value: Double)

  /** Batch-mode sessionization with identical semantics (gap-based
    * session split), expressed with a window lag — the oracle-friendly
    * twin of the streaming path.
    */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("ts_sec", col("ts").cast("long"))
      .withColumn("prev", lag(col("ts_sec"), 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull ||
          col("ts_sec") - col("prev") > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts_sec")).as("session_start"),
        max(col("ts_sec")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("__cents"))
      .withColumn("total_value", col("__cents").cast("double") / 100.0)
      .select("user_id", "session_start", "session_end", "n_events",
        "total_value")
  }

  // half-away rounding to match Spark round()/DuckDB ROUND — math.rint
  // is half-EVEN and would diverge on exact .5 cents
  private def toCents(v: Double): Long =
    if (v >= 0) math.floor(v * 100 + 0.5).toLong
    else math.ceil(v * 100 - 0.5).toLong

  /** One-pass lazy fold over a per-slice TIME-SORTED event iterator:
    * sessions stream out as they close; the only retained state is the
    * open session (4 longs) — a hot key never buffers its events or its
    * emitted sessions. The GroupState is written as the input exhausts,
    * which is safe: FlatMapGroupsWithStateExec commits state after the
    * returned iterator completes.
    *
    * Cross-slice lateness (streaming only — the batch path sorts
    * globally): an admissible event inside the open session's reach
    * ([start−gap, last+gap]) merges, widening the bounds; one older
    * than start−gap can no longer merge with anything still held and
    * emits immediately as its own session. For time-sorted input both
    * branches are no-ops and the fold is exactly the reference
    * semantics.
    */
  private def sessionIterator(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState], gapSeconds: Long,
      emitOpen: Boolean): Iterator[Session] = new Iterator[Session] {
    private var st: SessionState = state.getOption.orNull
    private var pending: Session = null
    private var done = false

    private def emit(s: SessionState): Session =
      Session(userId, s.start, s.last, s.n, s.cents / 100.0)

    private def advance(): Unit = {
      while (pending == null && !done) {
        if (!events.hasNext) {
          done = true
          if (st != null) {
            if (emitOpen) { pending = emit(st); state.remove() }
            else state.update(st)
            st = null
          }
        } else {
          val e = events.next()
          val sec = e.ts.getTime / 1000
          val cents = toCents(e.value)
          if (st != null && sec < st.start - gapSeconds) {
            pending = Session(userId, sec, sec, 1L, cents / 100.0)
          } else {
            if (st != null && sec - st.last > gapSeconds) {
              pending = emit(st)
              st = null
            }
            if (st == null) st = SessionState(sec, sec, 0L, 0L)
            st = SessionState(math.min(st.start, sec),
              math.max(st.last, sec), st.n + 1, st.cents + cents)
          }
        }
      }
    }

    def hasNext: Boolean = { advance(); pending != null }
    def next(): Session = {
      advance()
      val s = pending; pending = null; s
    }
  }

  /** Streaming sessionization: per-user state carries the open session;
    * an event past the gap closes and emits it. Event-time timeout would
    * drive emission in production; draining the bounded file source
    * closes remaining sessions via the final timeout pass — here we emit
    * closed sessions on arrival and flush open ones with a sentinel
    * batch, keeping the example deterministic.
    *
    * Scale shape: in batch mode the events are secondary-sorted — one
    * hash exchange on user_id plus a spillable within-partition sort on
    * (user_id, ts, event_id). That already satisfies the stateful
    * operator's distribution AND (by prefix) its ordering requirement,
    * so Catalyst inserts no further exchange or sort and the group
    * iterator arrives time-ordered: the fold is fully incremental and a
    * hot key never materializes in memory. In streaming mode a
    * per-micro-batch sort stands in (sorting is unsupported on
    * unbounded frames) — there the buffered unit is one user's slice of
    * one trigger, which the trigger interval bounds.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long,
      emitOpen: Boolean = false): Dataset[Session] = {
    import events.sparkSession.implicits._
    if (events.isStreaming)
      events.groupByKey(_.user_id)
        .flatMapGroupsWithState[SessionState, Session](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          case (userId, it, state: GroupState[SessionState]) =>
            sessionIterator(userId,
              it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).iterator,
              state, gapSeconds, emitOpen)
        }
    else
      events.repartition(col("user_id"))
        .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
        .as[Event]
        .groupBy(col("user_id")).as[Long, Event]
        .flatMapGroupsWithState[SessionState, Session](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          case (userId, it, state: GroupState[SessionState]) =>
            sessionIterator(userId, it, state, gapSeconds, emitOpen)
        }
  }

  /** Production streaming sessionization: watermark-driven emission.
    * The caller applies `withWatermark("ts", ...)` upstream; closed
    * sessions emit on arrival (in-batch gap), and an OPEN session emits
    * when the event-time timeout fires — i.e. once the watermark passes
    * last-activity + gap, the point after which no admissible event can
    * extend it. State per user is one open session (4 longs), removed on
    * timeout; the per-trigger sort is bounded by the trigger's slice.
    * The timeout target is clamped above the current watermark for late
    * slices (Spark rejects a timeout at or before the watermark).
    */
  def sessionizeStream(events: Dataset[Event],
      gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, _, state) if state.hasTimedOut =>
          val st = state.get
          state.remove()
          Iterator.single(
            Session(userId, st.start, st.last, st.n, st.cents / 100.0))
        case (userId, it, state: GroupState[SessionState]) =>
          // eager: the timeout must be (re)armed after the fold, and the
          // buffered unit is one user's slice of one trigger
          val out = sessionIterator(userId,
            it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).iterator,
            state, gapSeconds, emitOpen = false).toVector
          state.getOption.foreach { st =>
            val target = (st.last + gapSeconds) * 1000L + 1000L
            state.setTimeoutTimestamp(
              math.max(target, state.getCurrentWatermarkMs() + 1000L))
          }
          out.iterator
      }
  }

  /** Drain the events table through the sessionizer (batch mode: each
    * group processed once, trailing sessions flushed).
    */
  def run(spark: SparkSession, sfDir: String, gapSeconds: Long): DataFrame = {
    import spark.implicits._
    val ev = graft.Tables(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event]
    sessionize(ev, gapSeconds, emitOpen = true).toDF()
  }
}
