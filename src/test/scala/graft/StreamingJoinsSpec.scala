package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingJobs

class StreamingJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("foreachBatch idempotent sink absorbs redelivered keys (K1 streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("idem").toString
    val source = MemoryStream[(String, Double)]
    val stream = source.toDF().toDF("uuid", "value")
    val q = StreamingJobs.idempotentParquetSink(
      stream, s"$dir/table", Seq("uuid"), s"$dir/ckpt").start()
    try {
      source.addData(("a", 1.0), ("b", 2.0))
      q.processAllAvailable()
      source.addData(("a", 1.0), ("c", 3.0)) // "a" redelivered
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$dir/table")
      assert(rows.count() === 3)
      assert(rows.select("uuid").as[String].collect().sorted.toSeq ===
        Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("stream-static enrichment joins each batch against the dimension") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("KRW-BTC", "Bitcoin"), ("KRW-ETH", "Ethereum"))
      .toDF("market", "english_name")
    val source = MemoryStream[(String, Double)]
    val stream = source.toDF().toDF("market", "price")
    val enriched = StreamingJobs.enrichWithDim(stream, dim, "market")
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      source.addData(("KRW-BTC", 83e6), ("KRW-XRP", 700.0))
      q.processAllAvailable()
      val got = spark.table("enriched")
        .select("market", "english_name").as[(String, Option[String])]
        .collect().toMap
      assert(got("KRW-BTC") === Some("Bitcoin"))
      assert(got("KRW-XRP") === None, "unmatched keys survive the left join")
    } finally q.stop()
  }

  test("streaming range join == batch IntervalJoin on the same whole-second data") {
    // cross-paradigm parity: StreamingJobs.streamStreamJoin bounds matches
    // by rts in [lts, lts + w minutes] (inclusive upper); on whole-second
    // timestamps that interval equals IntervalJoin's half-open
    // [lts, lts + 60w + 1). Same data through both engines must agree.
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val lRows = (1 to 40).map(i => (s"u${rnd.nextInt(5)}",
      ts(f"2024-01-01 ${9 + rnd.nextInt(3)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"), i.toLong))
    val rRows = (1 to 60).map(i => (s"u${rnd.nextInt(5)}",
      ts(f"2024-01-01 ${9 + rnd.nextInt(3)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"), i.toLong))
    val lStream = MemoryStream[(String, Timestamp, Long)]
    val rStream = MemoryStream[(String, Timestamp, Long)]
    val joined = StreamingJobs.streamStreamJoin(
      lStream.toDF().toDF("user", "l_ts", "l_id"),
      rStream.toDF().toDF("user", "r_ts", "r_id"),
      "user", "l_ts", "r_ts", withinMinutes = 10, watermark = "6 hours")
    val q = joined.writeStream.format("memory").queryName("parity")
      .outputMode("append").start()
    try {
      lStream.addData(lRows: _*)
      rStream.addData(rRows: _*)
      q.processAllAvailable()
      val streamed = spark.table("parity").select($"l_id", $"r_id")
        .as[(Long, Long)].collect().toSet
      val batch = graft.operators.IntervalJoin.joinWithin(
          lRows.toDF("lu", "l_ts", "l_id"), rRows.toDF("ru", "r_ts", "r_id"),
          "lu", "ru", "l_ts", "r_ts", lowerSec = 0L, upperSec = 601L)
        .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(batch.nonEmpty, "fixture must actually produce matches")
    } finally q.stop()
  }

  test("UNKEYED interval join runs unchanged on streams: the bin equi-key " +
      "makes the otherwise-unsupported no-equality stream-stream join expressible") {
    // Spark refuses a stream-stream inner join with no equality predicate
    // (StreamingSymmetricHashJoin needs a hash key). joinWithinAll's bin
    // IS an equality key, so the same declarative operator runs on two
    // watermarked streams as-is — and must agree with itself on batch.
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val lRows = (1 to 30).map(i =>
      (ts(f"2024-01-01 ${9 + rnd.nextInt(2)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"), i.toLong))
    val rRows = (1 to 50).map(i =>
      (ts(f"2024-01-01 ${9 + rnd.nextInt(2)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"), i.toLong))
    val lStream = MemoryStream[(Timestamp, Long)]
    val rStream = MemoryStream[(Timestamp, Long)]
    val joined = graft.operators.IntervalJoin.joinWithinAll(
      lStream.toDF().toDF("l_ts", "l_id").withWatermark("l_ts", "6 hours"),
      rStream.toDF().toDF("r_ts", "r_id").withWatermark("r_ts", "6 hours"),
      "l_ts", "r_ts", lowerSec = -300L, upperSec = 300L)
    val q = joined.writeStream.format("memory").queryName("unkeyed_parity")
      .outputMode("append").start()
    try {
      lStream.addData(lRows: _*)
      rStream.addData(rRows: _*)
      q.processAllAvailable()
      val streamed = spark.table("unkeyed_parity").select($"l_id", $"r_id")
        .as[(Long, Long)].collect().toSet
      val batch = graft.operators.IntervalJoin.joinWithinAll(
          lRows.toDF("l_ts", "l_id"), rRows.toDF("r_ts", "r_id"),
          "l_ts", "r_ts", lowerSec = -300L, upperSec = 300L)
        .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
      assert(batch.nonEmpty, "fixture must actually produce matches")
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-stream join matches within the event-time range only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(String, Timestamp)]
    val buys = MemoryStream[(String, Timestamp)]
    val joined = StreamingJobs.streamStreamJoin(
      clicks.toDF().toDF("user", "click_ts"),
      buys.toDF().toDF("user", "buy_ts"),
      "user", "click_ts", "buy_ts", withinMinutes = 30)
    val q = joined.writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      clicks.addData(("u1", ts("2024-01-01 10:00:00")), ("u2", ts("2024-01-01 10:00:00")))
      buys.addData(
        ("u1", ts("2024-01-01 10:10:00")),  // within 30 min -> match
        ("u2", ts("2024-01-01 11:30:00")))  // 90 min later -> no match
      q.processAllAvailable()
      val users = spark.table("attributed").select("user").as[String]
        .collect().toSeq
      assert(users === Seq("u1"))
    } finally q.stop()
  }

  test("LEFT OUTER stream-stream join: null row for the unmatched click at watermark expiry") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(String, Timestamp)]
    val buys = MemoryStream[(String, Timestamp)]
    val joined = StreamingJobs.streamStreamJoinOuter(
      clicks.toDF().toDF("user", "click_ts"),
      buys.toDF().toDF("user", "buy_ts"),
      "user", "click_ts", "buy_ts", withinMinutes = 30, watermark = "1 minute")
    val q = joined.writeStream.format("memory").queryName("abandoned")
      .outputMode("append").start()
    try {
      clicks.addData(("u1", ts("2024-01-01 10:00:00")),
        ("u2", ts("2024-01-01 10:00:00")))
      buys.addData(("u1", ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      def rows() = spark.table("abandoned")
        .select($"user", $"buy_ts".isNull.as("abandoned"))
        .as[(String, Boolean)].collect().toSet
      // u1 matched; u2 must NOT be emitted yet — a buy could still arrive
      assert(rows() === Set(("u1", false)),
        "unmatched row must not surface before its window provably closed")
      // advance BOTH watermarks (global watermark = min of the inputs)
      // past 10:30 + 1 min: u2's window is provably empty
      clicks.addData(("w1", ts("2024-01-01 12:00:00")))
      buys.addData(("w2", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // eviction may land one batch later — drive one more batch
      clicks.addData(("w3", ts("2024-01-01 12:01:00")))
      q.processAllAvailable()
      val got = rows()
      assert(got(("u2", true)), s"abandoned click must emit with nulls: $got")
      assert(!got(("u1", true)), "the matched user must never get a null row")
      assert(got.count(_._1 == "u2") === 1, "exactly one outer row")
    } finally q.stop()
  }

  test("stream-stream join checkpoint restart: buffered unmatched row survives, " +
      "match delivered exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("ssj_ckpt").toString
    val clicks = MemoryStream[(String, Timestamp)]
    val buys = MemoryStream[(String, Timestamp)]
    // the memory sink refuses checkpoint recovery; foreachBatch is the
    // fault-tolerant collector a restartable test needs (the
    // StreamingSessionsSpec restart pattern)
    val emitted = scala.collection.mutable.ArrayBuffer[(String, Timestamp, Timestamp)]()
    def startQuery() = StreamingJobs.streamStreamJoin(
        clicks.toDF().toDF("user", "click_ts"),
        buys.toDF().toDF("user", "buy_ts"),
        "user", "click_ts", "buy_ts", withinMinutes = 30)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.select("user", "click_ts", "buy_ts").collect()
          .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2)))
        emitted.synchronized { emitted ++= rows }
        ()
      }.outputMode("append").start()

    // run 1: u2's click matches immediately; u1's click stays BUFFERED
    // unmatched inside the join's watermark-bounded state — after stop it
    // lives only in the checkpoint
    val q1 = startQuery()
    try {
      clicks.addData(("u1", ts("2024-01-01 10:00:00")),
        ("u2", ts("2024-01-01 10:00:00")))
      buys.addData(("u2", ts("2024-01-01 10:05:00")))
      q1.processAllAvailable()
      assert(emitted.synchronized(emitted.map(_._1).toSeq) === Seq("u2"),
        "u1 must still be unmatched at stop time")
    } finally q1.stop()

    // run 2, same checkpoint: the restored state must deliver u1's match
    // when its buy arrives — and must NOT replay u2's already-emitted row
    val q2 = startQuery()
    try {
      buys.addData(("u1", ts("2024-01-01 10:10:00")))
      q2.processAllAvailable()
      val all = emitted.synchronized(emitted.toList)
      assert(all.map(_._1).sorted === List("u1", "u2"),
        s"exactly one match per user across the restart, got $all")
      assert(all.find(_._1 == "u1").map(_._3.toString).contains("2024-01-01 10:10:00.0"))
    } finally q2.stop()
  }
}
