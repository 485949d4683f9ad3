package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingSessions
import graft.streaming.StreamingSessions.{SessEvent, SessionSummary}

/** transformWithState sessionization e2e: MemoryStream batches drive the
  * v2 state API (RocksDB provider, session-scoped), sessions close both
  * ways — next-event break and watermark timer — and the summaries match
  * a hand-derived gaps-and-islands reference. */
class StreamingSessionsSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("sessions close on gap break and on watermark timer; summaries exact") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = s.sqlContext
    import s.implicits._

    val source = MemoryStream[SessEvent]
    val out = StreamingSessions.sessionSummaries(
      source.toDS(), gapMs = 30 * 60000L, delay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // minute 1, not 0: a first-batch event AT the initial watermark (0)
      // is filtered as late by the event-time mode — off-by-the-epoch trap
      // user 1: two events 10 min apart (one session), then a 40-min gap
      // opens a second session — the FIRST closes via the in-batch break
      source.addData(
        SessEvent(1L, ts(1), 5L), SessEvent(1L, ts(11), 7L),
        SessEvent(2L, ts(6), 1L))
      q.processAllAvailable()
      source.addData(SessEvent(1L, ts(51), 11L))
      q.processAllAvailable()
      // user 1's first session closes via the in-batch break; user 2's via
      // its timer — timer expiry uses the batch's UPDATED watermark
      // (ts(51) → 51 min), which already passed user 2's 36-min horizon.
      // User 1's STALE timer (set before the ts(51) extension) fires in
      // the same batch and must emit nothing — the live horizon decides.
      val afterBreak = s.sql("SELECT * FROM sess_out")
        .as[SessionSummary].collect().toSet
      assert(afterBreak === Set(
        SessionSummary(1L, 60000L, 11 * 60000L, 2L, 12L),
        SessionSummary(2L, 6 * 60000L, 6 * 60000L, 1L, 1L)))

      // advancing the watermark past the last horizon fires user 1's
      // second-session timer
      source.addData(SessEvent(3L, ts(200), 0L))
      q.processAllAvailable()
      source.addData(SessEvent(3L, ts(201), 0L))
      q.processAllAvailable()
      val closed = s.sql("SELECT * FROM sess_out")
        .as[SessionSummary].collect().toSet
      assert(closed === Set(
        SessionSummary(1L, 60000L, 11 * 60000L, 2L, 12L),
        SessionSummary(1L, 51 * 60000L, 51 * 60000L, 1L, 11L),
        SessionSummary(2L, 6 * 60000L, 6 * 60000L, 1L, 1L)))
    } finally q.stop()
  }

  test("admitted disorder: backward merge within the gap, orphan singleton past it") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = s.sqlContext
    import s.implicits._

    // delay (60 min) > gap (30 min): the watermark admits events that
    // precede the open session's start — the disorder the processor must
    // absorb without throwing
    val source = MemoryStream[SessEvent]
    val out = StreamingSessions.sessionSummaries(
      source.toDS(), gapMs = 30 * 60000L, delay = "60 minutes")
    val q = out.writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      source.addData(SessEvent(1L, ts(100), 5L))
      q.processAllAvailable() // watermark -> min 40
      // min 45: admitted (>= 40) but 55 min before the open start — a
      // gap-isolated straggler, emitted as a late singleton;
      // min 80: admitted, within the gap of start 100 — backward merge
      source.addData(SessEvent(1L, ts(45), 3L), SessEvent(1L, ts(80), 7L))
      q.processAllAvailable()
      val mid = s.sql("SELECT * FROM sess_late")
        .as[SessionSummary].collect().toSet
      assert(mid === Set(SessionSummary(1L, 45 * 60000L, 45 * 60000L, 1L, 3L)))
      // close the (backward-extended) open session via the timer
      source.addData(SessEvent(2L, ts(500), 0L))
      q.processAllAvailable()
      source.addData(SessEvent(2L, ts(501), 0L))
      q.processAllAvailable()
      val closed = s.sql("SELECT * FROM sess_late")
        .as[SessionSummary].collect().toSet
      assert(closed === Set(
        SessionSummary(1L, 45 * 60000L, 45 * 60000L, 1L, 3L),
        SessionSummary(1L, 80 * 60000L, 100 * 60000L, 2L, 12L)))
    } finally q.stop()
  }

  test("checkpoint restart mid-open-session: state and timer survive, one merged summary") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = s.sqlContext
    import s.implicits._

    val ckpt = java.nio.file.Files.createTempDirectory("sess_ckpt").toString
    val source = MemoryStream[SessEvent]
    // the memory sink refuses checkpoint recovery; foreachBatch is the
    // fault-tolerant collector a restartable test needs
    val emitted = scala.collection.mutable.ArrayBuffer[SessionSummary]()
    def startQuery() = StreamingSessions.sessionSummaries(
        source.toDS(), gapMs = 30 * 60000L, delay = "0 seconds")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[SessionSummary], _: Long) =>
        val rows = b.collect()
        emitted.synchronized { emitted ++= rows }
        ()
      }
      .outputMode("append").start()

    // run 1: open a session (two events, 10 min apart) and stop with the
    // session STILL OPEN — its aggregate and its minute-50 timer live only
    // in the RocksDB checkpoint now
    val q1 = startQuery()
    try {
      source.addData(SessEvent(1L, ts(10), 5L), SessEvent(1L, ts(20), 7L))
      q1.processAllAvailable()
      assert(emitted.isEmpty, "session must still be open at stop time")
    } finally q1.stop()

    // run 2, same checkpoint: the committed batch must not replay, the
    // open session must resume, and an in-gap event must extend it —
    // continuous-consumer resume semantics
    val q2 = startQuery()
    try {
      source.addData(SessEvent(1L, ts(25), 1L))
      q2.processAllAvailable()
      // close via the watermark: the merged summary spans BOTH runs
      source.addData(SessEvent(2L, ts(200), 0L))
      q2.processAllAvailable()
      val u1 = emitted.synchronized { emitted.filter(_.user_id == 1L).toSeq }
      assert(u1 === Seq(SessionSummary(1L, 10 * 60000L, 25 * 60000L, 3L, 13L)),
        s"resumed session must merge pre- and post-restart events once: $emitted")
      // exactly one summary for the key: the pre-restart minute-50 timer
      // (stale after the ts(25) extension) must not have double-emitted
      assert(u1.size === 1)
    } finally q2.stop()
  }

  test("random stream across batches == batch gaps-and-islands reference") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = s.sqlContext
    import s.implicits._

    val gapMs = 10 * 60000L
    val rnd = new scala.util.Random(23)
    var t = 60000L
    val events = (1 to 200).map { _ =>
      t += rnd.nextInt(8) * 60000L + 1000L // 1s..7min steps: mixed gaps
      SessEvent(rnd.nextInt(3).toLong, new Timestamp(t), rnd.nextInt(10).toLong)
    }
    // reference: the BATCH gaps-and-islands fold — the same function q184
    // runs over the events fixture under the DuckDB oracle, so this
    // streaming contract inherits a driver-visible hash-checked reference
    val expected = StreamingSessions
      .batchSessionSummaries(events.toDS(), gapMs)
      .as[SessionSummary].collect().toSet

    val source = MemoryStream[SessEvent]
    val out = StreamingSessions.sessionSummaries(
      source.toDS(), gapMs = gapMs, delay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sess_rnd")
      .outputMode("append").start()
    try {
      // time-ordered chunks (the watermark contract); a far-future closer
      // event per user flushes every open session through its timer
      events.grouped(70).foreach { chunk =>
        source.addData(chunk: _*)
        q.processAllAvailable()
      }
      val far = new Timestamp(t + 100 * 60000L)
      (0L to 2L).foreach(u => source.addData(SessEvent(u, far, 0L)))
      q.processAllAvailable()
      source.addData(SessEvent(9L, new Timestamp(far.getTime + 3600000L), 0L))
      q.processAllAvailable()
      val got = s.sql("SELECT * FROM sess_rnd").as[SessionSummary]
        .collect().toSet
      // drop the closer sessions themselves from the comparison
      val gotCore = got.filterNot(x => x.start_ms >= far.getTime)
      assert(gotCore === expected)
    } finally q.stop()
  }
}
