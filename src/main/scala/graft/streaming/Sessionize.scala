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

  /** Streaming sessionization: per-user state carries the open session;
    * an event past the gap closes and emits it. Event-time timeout would
    * drive emission in production; draining the bounded file source
    * closes remaining sessions via the final timeout pass — here we emit
    * closed sessions on arrival and flush open ones with a sentinel
    * batch, keeping the example deterministic.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long,
      emitOpen: Boolean = false): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, it, state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var st = state.getOption.orNull
          for (e <- sorted) {
            val sec = e.ts.getTime / 1000
            if (st != null && sec - st.last > gapSeconds) {
              out += Session(userId, st.start, st.last, st.n, st.cents / 100.0)
              st = null
            }
            if (st == null) st = SessionState(sec, sec, 0L, 0L)
            // half-away rounding to match Spark round()/DuckDB ROUND —
            // math.rint is half-EVEN and would diverge on exact .5 cents
            val cents =
              if (e.value >= 0) math.floor(e.value * 100 + 0.5).toLong
              else math.ceil(e.value * 100 - 0.5).toLong
            st = st.copy(last = sec, n = st.n + 1, cents = st.cents + cents)
          }
          if (st != null) {
            if (emitOpen) { // batch drain: flush the trailing session
              out += Session(userId, st.start, st.last, st.n, st.cents / 100.0)
              state.remove()
            } else state.update(st)
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
