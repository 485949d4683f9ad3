package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming OHLCV candles with custom keyed state (SURVEY A6 over T1-T5:
  * the candle analytics the reference consumes precomputed, maintained
  * incrementally over an event stream).
  *
  * `flatMapGroupsWithState` keeps one running candle per (series, day);
  * an event-time watermark drives `EventTimeTimeout`, which finalizes and
  * emits a candle once the watermark passes the end of its day — the
  * streaming analogue of the batch `TimeSeriesOps.ohlcv` contract
  * (deterministic open/close by event time with sequence tie-break).
  */
object StreamingCandles {

  case class Tick(series: String, ts: Timestamp, seq: Long, price: Double)

  case class CandleState(
      openTsUs: Long, openSeq: Long, open: Double,
      closeTsUs: Long, closeSeq: Long, close: Double,
      high: Double, low: Double, volume: Double, n: Long)

  case class Candle(series: String, day: String, open: Double, high: Double,
      low: Double, close: Double, volume: Double, n: Long)

  private val DayUs = 86400000000L

  private def dayOf(usEpoch: Long): String =
    java.time.LocalDate.ofEpochDay(usEpoch / DayUs).toString

  private def update(state: Option[CandleState], t: Tick): CandleState = {
    val us = t.ts.getTime * 1000
    state match {
      case None =>
        CandleState(us, t.seq, t.price, us, t.seq, t.price,
          t.price, t.price, t.price, 1L)
      case Some(s) =>
        val opens = us < s.openTsUs || (us == s.openTsUs && t.seq < s.openSeq)
        val closes = us > s.closeTsUs || (us == s.closeTsUs && t.seq > s.closeSeq)
        CandleState(
          if (opens) us else s.openTsUs,
          if (opens) t.seq else s.openSeq,
          if (opens) t.price else s.open,
          if (closes) us else s.closeTsUs,
          if (closes) t.seq else s.closeSeq,
          if (closes) t.price else s.close,
          math.max(s.high, t.price),
          math.min(s.low, t.price),
          s.volume + t.price,
          s.n + 1)
    }
  }

  /** ticks must carry a watermark on `ts` (caller sets `withWatermark`
    * before groupByKey). Emits each (series, day) candle exactly once, when
    * the watermark passes the day boundary. */
  def candles(spark: SparkSession, ticks: Dataset[Tick]): Dataset[Candle] = {
    import spark.implicits._
    ticks
      .groupByKey(t => (t.series, dayOf(t.ts.getTime * 1000)))
      .flatMapGroupsWithState[CandleState, Candle](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((series, day), events, state: GroupState[CandleState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Candle(series, day, s.open, s.high, s.low,
              s.close, s.volume, s.n))
          } else {
            val merged = events.foldLeft(state.getOption)((acc, t) => Some(update(acc, t)))
            merged.foreach(state.update)
            // finalize when the watermark passes the end of this day
            val dayEndMs = (java.time.LocalDate.parse(day).toEpochDay + 1) * 86400000L
            state.setTimeoutTimestamp(dayEndMs)
            Iterator.empty
          }
      }
  }
}
