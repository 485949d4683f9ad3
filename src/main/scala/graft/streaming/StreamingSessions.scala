package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Event-time sessionization on the state API v2 (`transformWithState`,
  * the arbitrary-state successor to flatMapGroupsWithState): per-user
  * gap-bounded sessions whose SUMMARY — bounds, event count, exact value
  * mass — is emitted either when a later event opens the next session or
  * when the watermark passes the session's close horizon (event-time
  * timer). State per key is ONE fixed-size aggregate row + one timer —
  * the bytes-per-key floor for sessionization; the raw events are never
  * buffered (contrast `session_window` aggregation, which holds the
  * window state inside the aggregation operator — this form hands the
  * policy to user code, which is what the v2 API exists for).
  *
  * Disorder contract: events within a batch fold in event-time order;
  * an admitted out-of-order event OLDER than the open session's start
  * (the watermark bounds lateness against the global max event time,
  * not against per-key session starts, so this happens under ordinary
  * disorder) merges BACKWARD when it sits within the gap of the start —
  * the open session simply began earlier than first observed. A
  * gap-isolated straggler older still is emitted immediately as its own
  * single-event session record: its close horizon has logically passed,
  * and append-mode streaming cannot revise the already-emitted session
  * it might have bridged — the same inherent limit `session_window`
  * aggregation has once results are emitted. Nothing throws on late
  * data; a poison-pill event would otherwise crash-loop the query
  * through checkpoint replay.
  *
  * Timer discipline: exactly one pending timer per key — the previous
  * horizon's timer is deleted whenever an update moves the horizon; a
  * stale timer that still fires re-checks the live state's true horizon
  * and emits nothing. Requires the RocksDB state store provider (a
  * transformWithState constraint).
  */
object StreamingSessions {

  final case class SessEvent(user_id: Long, ts: java.sql.Timestamp, vu: Long)
  final case class SessAgg(startMs: Long, endMs: Long, n: Long, vuSum: Long)
  final case class SessionSummary(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, value_units: Long)

  private[streaming] class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessEvent, SessionSummary] {

    @transient private var sess: ValueState[SessAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessAgg]("sess",
        Encoders.product[SessAgg], TTLConfig.NONE)

    private def summary(key: Long, a: SessAgg): SessionSummary =
      SessionSummary(key, a.startMs, a.endMs, a.n, a.vuSum)

    override def handleInputRows(key: Long, rows: Iterator[SessEvent],
        timerValues: TimerValues): Iterator[SessionSummary] = {
      val sorted = rows.map(e => (e.ts.getTime, e.vu)).toSeq.sortBy(_._1)
      var out = List.empty[SessionSummary]
      val prior = if (sess.exists()) Option(sess.get()) else None
      var cur = prior
      sorted.foreach { case (ms, vu) =>
        cur = cur match {
          case Some(a) if ms >= a.startMs && ms - a.endMs <= gapMs =>
            Some(SessAgg(a.startMs, math.max(a.endMs, ms), a.n + 1, a.vuSum + vu))
          case Some(a) if ms > a.endMs =>
            out ::= summary(key, a)
            Some(SessAgg(ms, ms, 1L, vu))
          case Some(a) if a.startMs - ms <= gapMs =>
            // admitted disorder inside the gap: the open session started
            // earlier than first observed — extend backward
            Some(SessAgg(ms, a.endMs, a.n + 1, a.vuSum + vu))
          case Some(a) =>
            // gap-isolated straggler: its session would already be closed;
            // emit it as a late singleton record, keep the open session
            out ::= SessionSummary(key, ms, ms, 1L, vu)
            Some(a)
          case None => Some(SessAgg(ms, ms, 1L, vu))
        }
      }
      cur.foreach { a =>
        sess.update(a)
        val horizon = a.endMs + gapMs
        prior.map(_.endMs + gapMs).filter(_ != horizon)
          .foreach(getHandle.deleteTimer)
        getHandle.registerTimer(horizon)
      }
      out.reverse.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionSummary] = {
      if (sess.exists()) {
        val a = sess.get()
        // a stale timer from before an extension fires early: the live
        // horizon decides, not the timer that happened to trigger
        if (timerValues.getCurrentWatermarkInMs() >= a.endMs + gapMs) {
          sess.clear()
          Iterator.single(summary(key, a))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  /** The BATCH form of the same sessionization — classic gaps-and-islands
    * over the full event set, emitting the identical [[SessionSummary]]
    * shape. This is the streaming processor's ground truth: on in-order
    * data every session the stream ever emits (by break or by timer) is a
    * row of this frame, and q184 puts THIS function under the DuckDB
    * oracle, so the streaming contract inherits a hash-checked reference.
    *
    * Semantics note: the break condition is `diff > gap` (an event
    * exactly `gap` after the last one still MERGES), mirroring the
    * processor's `ms - endMs <= gapMs` merge test — deliberately distinct
    * from `session_window`'s exclusive close (diff >= gap breaks), which
    * q35 oracles separately.
    *
    * Scale shape: one hash exchange on user_id + one sort per partition
    * (the two window functions and the final aggregate all share it);
    * equal-timestamp ties are safe because a 0 diff merges regardless of
    * the tie order and min/max/count/sum are order-invariant. */
  def batchSessionSummaries(events: Dataset[SessEvent], gapMs: Long): org.apache.spark.sql.DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy($"user_id").orderBy($"ms")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select($"user_id", unix_millis($"ts").as("ms"), $"vu")
      .withColumn("brk",
        when(lag($"ms", 1).over(w).isNull ||
          $"ms" - lag($"ms", 1).over(w) > gapMs, 1).otherwise(0))
      .withColumn("sess", sum($"brk").over(run))
      .groupBy($"user_id", $"sess")
      .agg(min($"ms").as("start_ms"), max($"ms").as("end_ms"),
        count(lit(1)).as("n_events"), sum($"vu").as("value_units"))
      .select($"user_id", $"start_ms", $"end_ms", $"n_events", $"value_units")
  }

  /** Session summaries for `events` (caller supplies the watermark delay
    * that bounds disorder): Append-mode stream of closed sessions. */
  def sessionSummaries(events: Dataset[SessEvent], gapMs: Long,
      delay: String): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append(),
        Encoders.product[SessionSummary])
  }
}
