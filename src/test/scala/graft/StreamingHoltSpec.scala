package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingJobs
import graft.streaming.StreamingJobs.{HoltEvent, HoltPoint}

/** holtOnArrival == the batch holt fold over the concatenated prefix:
  * the keyed (level, trend, count) state survives micro-batch
  * boundaries and every emitted integer matches the batch operator. */
class StreamingHoltSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(60000L + s * 1000L)

  test("streamed Holt points == batch operator over the same events") {
    implicit val sqlCtx = spark.sqlContext
    // three keys, deterministic drifting values, split across 3 batches
    val events = for (k <- 1L to 3L; i <- 0 until 40) yield
      HoltEvent(k, ts(i * 10 + k), i.toLong,
        10.0 + k * i * 0.5 + ((i * 2654435761L + k) % 7) * 0.25)
    val source = MemoryStream[HoltEvent]
    val q = StreamingJobs.holtOnArrival(source.toDS())
      .writeStream.format("memory").queryName("holt_out")
      .outputMode("append").start()
    try {
      events.grouped(45).foreach { chunk =>
        source.addData(chunk: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("holt_out").as[HoltPoint]
        .collect().map(p => (p.key, p.rn) -> (p.vu, p.level, p.trend, p.forecast))
        .toMap
      val batch = graft.operators.TimeSeriesOps.holt(
          events.toDF(), "key", "ts", "tie", "v")
        .select($"key", $"rn", $"vu", $"level", $"trend", $"forecast")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .map { case (k, rn, vu, l, b, f) => (k, rn) -> (vu, l, b, f) }.toMap
      assert(streamed.size === events.size)
      assert(streamed === batch,
        "streamed Holt state must continue the batch recurrence exactly")
    } finally q.stop()
  }
}
