package graft

import graft.operators.TimeSeriesOps

/** Two-sided integer CUSUM: hand-traced alarms with restart, symmetry,
  * driver-side reference equality. */
class CusumSpec extends SparkSpec {
  import spark.implicits._

  private def toTs(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("upward drift alarms at h and restarts") {
    val df = Seq(
      (1L, toTs(10), 1L, 2.0),
      (1L, toTs(20), 2L, 2.5),
      (1L, toTs(30), 3L, 3.0),
      (1L, toTs(40), 4L, 0.5)).toDF("k", "ts", "id", "v")
    val got = TimeSeriesOps.cusum(df, "k", "ts", "id", "v",
        refUnits = 1000L, hUnits = 2500L)
      .orderBy("rn").collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getBoolean(5)))
    // sp: 1000, 2500 (== h, no alarm), 4500 > h -> alarm + reset, then 0
    // sn: 0, 0, 0, 500
    assert(got.toSeq === Seq(
      (1000L, 0L, false), (2500L, 0L, false), (0L, 0L, true), (0L, 500L, false)))
  }

  test("downward drift alarms symmetrically") {
    val df = Seq(
      (1L, toTs(10), 1L, 0.0),
      (1L, toTs(20), 2L, 0.0),
      (1L, toTs(30), 3L, 0.0)).toDF("k", "ts", "id", "v")
    val got = TimeSeriesOps.cusum(df, "k", "ts", "id", "v",
        refUnits = 1000L, hUnits = 2500L)
      .orderBy("rn").collect()
      .map(r => (r.getLong(4), r.getBoolean(5)))
    // sn: 1000, 2000, 3000 > h -> alarm + reset
    assert(got.toSeq === Seq((1000L, false), (2000L, false), (0L, true)))
  }

  test("equals a driver-side reference on generated data") {
    val rows = (0 until 300).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cusum:$i".getBytes("UTF-8"))
      (h(0) & 0x03L, toTs(i * 13L), i.toLong, (h(1) & 0xff) / 16.0) }
    val (ref, hU) = (8000L, 20000L)
    val got = TimeSeriesOps.cusum(rows.toDF("k", "ts", "id", "v"),
        "k", "ts", "id", "v", ref, hU)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    val want = rows.groupBy(_._1).flatMap { case (k, evs) =>
      val sorted = evs.sortBy(e => (e._2.getTime, e._3))
      var sp = 0L; var sn = 0L
      sorted.zipWithIndex.map { case ((_, _, _, v), i) =>
        val vu = math.floor(v * 1000 + 0.5).toLong
        val spRaw = math.max(0L, sp + vu - ref)
        val snRaw = math.max(0L, sn + ref - vu)
        val alarm = spRaw > hU || snRaw > hU
        sp = if (spRaw > hU) 0L else spRaw
        sn = if (snRaw > hU) 0L else snRaw
        (k, i + 1L) -> ((vu, sp, sn, alarm))
      }
    }
    assert(got === want)
    assert(want.values.exists(_._4), "generated series must contain alarms")
  }

  test("streaming cusumOnArrival == batch cusum over the concatenated prefix") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingJobs
    import graft.streaming.StreamingJobs.CusumEvent
    implicit val sqlCtx = spark.sqlContext
    val all = (0 until 80).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"scusum:$i".getBytes("UTF-8"))
      CusumEvent(h(0) & 0x01L, toTs(i * 10L), i.toLong, (h(1) & 0xff) / 10.0) }
    val (ref, hU) = (12000L, 30000L)
    val source = MemoryStream[CusumEvent]
    val q = StreamingJobs.cusumOnArrival(source.toDS(), ref, hU)
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("append").start()
    try {
      // two batches, event-time ordered across the split
      source.addData(all.take(50): _*)
      q.processAllAvailable()
      source.addData(all.drop(50): _*)
      q.processAllAvailable()
      val streamed = spark.table("cusum_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
      val batch = graft.operators.TimeSeriesOps.cusum(
          all.toDF(), "key", "ts", "tie", "v", ref, hU)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
      assert(streamed === batch)
      assert(batch.values.exists(_._4), "series must contain alarms")
    } finally q.stop()
  }

  test("parameter validation") {
    val df = Seq((1L, toTs(1), 1L, 1.0)).toDF("k", "ts", "id", "v")
    intercept[IllegalArgumentException] {
      TimeSeriesOps.cusum(df, "k", "ts", "id", "v", 0L, 0L) }
    intercept[IllegalArgumentException] {
      TimeSeriesOps.cusum(df, "k", "ts", "id", "v", 0L, 10L, valueUnits = 0) }
  }
}
