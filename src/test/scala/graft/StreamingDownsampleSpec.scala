package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Downsample
import graft.streaming.StreamingDownsample
import graft.streaming.StreamingDownsample.{DsEvent, DsSample}

/** Streaming LTTB e2e: per-bucket representatives emit once the watermark
  * closes the right neighbor, match the batch operator on gapless series,
  * and follow the documented index-adjacent contract on gaps. */
class StreamingDownsampleSpec extends SparkSpec {

  private val W = 1000L

  private def harness() = {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private def ev(k: String, ms: Long, v: Double): DsEvent =
    DsEvent(k, new Timestamp(ms), v)

  test("gapless series: streamed emissions equal the batch operator row-for-row") {
    val s = harness()
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val rnd = new scala.util.Random(19)
    val data = (0 until 120).map { i =>
      ev("a", 100L + rnd.nextInt(3900), rnd.nextInt(5000) / 7.0)
    }
    val source = MemoryStream[DsEvent]
    val q = StreamingDownsample.downsampled(source.toDS(), W, "0 seconds")
      .writeStream.format("memory").queryName("ds_out")
      .outputMode("append").start()
    try {
      source.addData(data: _*)
      q.processAllAvailable()
      // sentinel key advances the watermark far past every a-bucket horizon
      source.addData(ev("wm", 100000L, 0.0))
      q.processAllAvailable()
      source.addData(ev("wm", 100001L, 0.0))
      q.processAllAvailable()
      val got = s.sql("SELECT * FROM ds_out").as[DsSample].collect()
        .filter(_.key == "a")
        .map(d => (d.key, d.bucket, d.x_millis, d.y_units, d.n_points))
        .sortBy(t => (t._1, t._2)).toSeq
      val batch = Downsample.lttb(
          data.toDF("k", "ts", "v"), "k", "ts", "v", W)
        .orderBy($"k", $"bucket").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      assert(got === batch)
      assert(got.map(_._2).toSet === Set(0L, 1L, 2L, 3L))
    } finally q.stop()
  }

  test("gap contract: a bucket behind a gap applies the earliest-point edge rule") {
    val s = harness()
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val source = MemoryStream[DsEvent]
    val q = StreamingDownsample.downsampled(source.toDS(), W, "0 seconds")
      .writeStream.format("memory").queryName("ds_gap")
      .outputMode("append").start()
    try {
      // buckets 0 and 2, nothing in 1: index-adjacent neighbors are both
      // absent for bucket 2 → earliest rule (the batch form would skip the
      // gap, call bucket 2 last, and keep the LATEST — the documented
      // divergence)
      source.addData(
        ev("a", 100L, 1.0), ev("a", 900L, 2.0),
        ev("a", 2100L, 3.0), ev("a", 2900L, 4.0))
      q.processAllAvailable()
      source.addData(ev("wm", 50000L, 0.0))
      q.processAllAvailable()
      source.addData(ev("wm", 50001L, 0.0))
      q.processAllAvailable()
      val got = s.sql("SELECT * FROM ds_gap").as[DsSample].collect()
        .filter(_.key == "a").map(d => (d.bucket, d.x_millis, d.y_units))
        .sortBy(_._1).toSeq
      assert(got === Seq((0L, 100L, 1000000L), (2L, 2100L, 3000000L)))
    } finally q.stop()
  }

  test("each bucket emits exactly once across incremental batches") {
    val s = harness()
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val source = MemoryStream[DsEvent]
    val q = StreamingDownsample.downsampled(source.toDS(), W, "0 seconds")
      .writeStream.format("memory").queryName("ds_once")
      .outputMode("append").start()
    try {
      (0 until 8).foreach { b =>
        source.addData(ev("a", b * W + 100L, b.toDouble),
          ev("a", b * W + 600L, b + 0.5))
        q.processAllAvailable()
      }
      source.addData(ev("wm", 60000L, 0.0))
      q.processAllAvailable()
      source.addData(ev("wm", 60001L, 0.0))
      q.processAllAvailable()
      val rows = s.sql("SELECT * FROM ds_once").as[DsSample].collect()
        .filter(_.key == "a").toSeq
      assert(rows.map(_.bucket).sorted === (0L to 7L))
      assert(rows.forall(_.n_points == 2L))
    } finally q.stop()
  }

  test("streaming M4 windows equal the batch m4 frame row-for-row") {
    val s = harness()
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val data = (0 until 150).map { _ =>
      ev(if (rnd.nextBoolean()) "a" else "b",
        100L + rnd.nextInt(3900), rnd.nextInt(4000) / 9.0)
    }
    val source = MemoryStream[StreamingDownsample.DsEvent]
    val q = StreamingDownsample.m4Windows(source.toDS(), W, "0 seconds")
      .writeStream.format("memory").queryName("m4_out")
      .outputMode("append").start()
    try {
      source.addData(data: _*)
      q.processAllAvailable()
      source.addData(ev("wm", 100000L, 0.0))
      q.processAllAvailable()
      source.addData(ev("wm", 100001L, 0.0))
      q.processAllAvailable()
      val got = s.sql("SELECT * FROM m4_out WHERE key != 'wm'")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getLong(8), r.getLong(9), r.getLong(10)))
        .sortBy(t => (t._1, t._2)).toSeq
      val batch = graft.operators.Downsample.m4(
          data.toDF("k", "ts", "v"), "k", "ts", "v", W)
        .orderBy($"k", $"bucket").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
          r.getLong(8), r.getLong(9), r.getLong(10))).toSeq
      assert(got === batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("late input past the watermark is dropped, not re-emitted") {
    val s = harness()
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val source = MemoryStream[DsEvent]
    val q = StreamingDownsample.downsampled(source.toDS(), W, "0 seconds")
      .writeStream.format("memory").queryName("ds_late")
      .outputMode("append").start()
    try {
      source.addData(ev("a", 500L, 1.0), ev("a", 1500L, 2.0),
        ev("a", 9500L, 3.0))
      q.processAllAvailable()
      source.addData(ev("a", 9600L, 3.0))
      q.processAllAvailable()
      val before = s.sql("SELECT * FROM ds_late").count()
      // bucket-0 straggler: watermark (9500) is far past its horizon
      source.addData(ev("a", 600L, 50.0))
      q.processAllAvailable()
      source.addData(ev("a", 9700L, 3.0))
      q.processAllAvailable()
      val after = s.sql("SELECT * FROM ds_late").as[DsSample].collect()
      assert(after.length === before)
      // and the already-emitted bucket 0 row still reflects only x=500
      val b0 = after.filter(d => d.key == "a" && d.bucket == 0L)
      assert(b0.map(d => d.x_millis).toSeq === Seq(500L))
    } finally q.stop()
  }
}
