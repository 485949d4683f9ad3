package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{EventCleaner, StreamingJobs}

/** End-to-end streaming ETL in the reference's own test style
  * (docker-elk run-tests-core.sh:79-106): inject known records at the head,
  * assert exact counts/contents at the tail. MemoryStream + memory sink make
  * the full readStream→transform→writeStream path run synchronously. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val goodProfile =
    """{"full_name":"Jane Doe","id":"123","is_new":"true","is_private":"false",
      |"is_verified":"true","latest_reel_media":"42","profile_pic_id":"p1",
      |"profile_pic_url":"http://x/y.jpg","username":"jane"}""".stripMargin.replace("\n", "")
  private val emptyFieldsProfile =
    """{"full_name":"","id":"9","is_new":"","is_private":"false",
      |"is_verified":"","latest_reel_media":"","profile_pic_id":" ",
      |"profile_pic_url":"","username":"nine"}""".stripMargin.replace("\n", "")
  private val emptyObject = "{}"
  private val garbage = "not json at all"

  test("profile chain end-to-end: parse, drop-empty, flatten, cast, nullify") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val cleaned = EventCleaner.cleanProfiles(
      source.toDF().withColumnRenamed("value", "message"))
    val q = cleaned.writeStream.format("memory").queryName("profiles")
      .outputMode("append").start()
    try {
      source.addData(goodProfile, emptyFieldsProfile, emptyObject, garbage)
      q.processAllAvailable()
      val rows = spark.table("profiles").orderBy("id").collect()
      // {} and garbage dropped (P4); 2 rows survive
      assert(rows.length === 2)
      val good = rows.find(_.getAs[String]("id") == "123").get
      assert(good.getAs[String]("full_name") === "Jane Doe")
      assert(good.getAs[Boolean]("is_new") === true)
      assert(good.getAs[Int]("latest_reel_media") === 42)
      val sparse = rows.find(_.getAs[String]("id") == "9").get
      // empty strings (and blank " ") nullified (P5), non-empty kept
      assert(sparse.isNullAt(sparse.fieldIndex("full_name")))
      assert(sparse.isNullAt(sparse.fieldIndex("is_new")))
      assert(sparse.isNullAt(sparse.fieldIndex("latest_reel_media")))
      assert(sparse.isNullAt(sparse.fieldIndex("profile_pic_id")))
      assert(sparse.getAs[Boolean]("is_private") === false)
      assert(sparse.getAs[String]("username") === "nine")
    } finally q.stop()
  }

  test("streaming session windows close at the inactivity gap (T9)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(String, Timestamp)]
    val stream = source.toDF().toDF("user", "ts")
    val sessions = StreamingJobs.sessionCounts(stream, "ts", "user",
      gap = "30 minutes", watermark = "5 minutes")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // two bursts 40 min apart -> two sessions for u1
      source.addData(
        ("u1", Timestamp.valueOf("2024-01-01 00:00:00")),
        ("u1", Timestamp.valueOf("2024-01-01 00:10:00")),
        ("u1", Timestamp.valueOf("2024-01-01 00:50:00")))
      q.processAllAvailable()
      // advance the watermark far enough to finalize both sessions
      source.addData(("u2", Timestamp.valueOf("2024-01-01 03:00:00")))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select($"user", $"n").as[(String, Long)].collect().toSeq.sorted
      assert(rows === Seq(("u1", 1L), ("u1", 2L)),
        s"two sessions of 2 and 1 events, got $rows")
    } finally q.stop()
  }

  test("content dedup drops same-payload records under fresh ids") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(String, Timestamp, String)]
    val stream = source.toDF().toDF("uuid", "ts", "body")
    val deduped = StreamingJobs.dedupByContent(stream, "body", "ts")
    val q = deduped.writeStream.format("memory").queryName("content_dedup")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      source.addData(("a", t0, "same payload"), ("b", t0, "other payload"))
      q.processAllAvailable()
      // re-scrape: new uuid, identical content -> dropped; new content kept
      source.addData(("c", t0, "same payload"), ("d", t0, "third payload"))
      q.processAllAvailable()
      val kept = spark.table("content_dedup").select("uuid").as[String].collect().sorted
      assert(kept.toSeq === Seq("a", "b", "d"))
      // the helper digest column does not leak into the output
      assert(!spark.table("content_dedup").columns.contains("__digest"))
    } finally q.stop()
  }

  test("normalized content dedup collapses reformatted redeliveries in-stream") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(String, Timestamp, String)]
    val stream = source.toDF().toDF("uuid", "ts", "body")
    val deduped = StreamingJobs.dedupByContent(stream, "body", "ts",
      digest = c => md5(graft.functions.TextFunctions.normalizeText(c)))
    val q = deduped.writeStream.format("memory").queryName("norm_dedup")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      source.addData(("a", t0, "same payload"), ("b", t0, "other payload"))
      q.processAllAvailable()
      // re-scrape delivers the SAME content re-wrapped and re-cased (plus
      // an NFD-encoded accent): all must collapse onto 'a'; raw-md5 dedup
      // would keep every one of them
      source.addData(
        ("c", t0, "  Same   payload "),
        ("d", t0, "SAME\tPAYLOAD"),
        ("e", t0, "same payload"),
        ("f", t0, "fresh café")) // NFD: e + combining acute
      q.processAllAvailable()
      source.addData(("g", t0, "fresh café")) // NFC spelling of the same
      q.processAllAvailable()
      val kept = spark.table("norm_dedup").select("uuid").as[String].collect().sorted
      assert(kept.toSeq === Seq("a", "b", "f"))
    } finally q.stop()
  }

  test("watermark dedup absorbs redelivery (T2 at-least-once -> once)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(String, Timestamp, Double)]
    val stream = source.toDF().toDF("uuid", "ts", "value")
    val deduped = StreamingJobs.dedupByKey(stream, "uuid", "ts")
    val q = deduped.writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      source.addData(("a", t0, 1.0), ("b", t0, 2.0))
      q.processAllAvailable()
      source.addData(("a", t0, 1.0), ("c", t0, 3.0)) // redelivery of a
      q.processAllAvailable()
      val keys = spark.table("deduped").select("uuid").as[String].collect().sorted
      assert(keys.toSeq === Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("tumbling window counts with watermark (T4)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String, Double)]
    val stream = source.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingJobs.tumblingCounts(stream, "ts", "event_type")
    val q = agg.writeStream.format("memory").queryName("windows")
      .outputMode("append").start()
    try {
      source.addData(
        (Timestamp.valueOf("2024-01-01 00:00:10"), "click", 1.0),
        (Timestamp.valueOf("2024-01-01 00:00:40"), "click", 2.0),
        (Timestamp.valueOf("2024-01-01 00:01:10"), "view", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to finalize the earlier windows
      source.addData((Timestamp.valueOf("2024-01-01 01:00:00"), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("windows")
        .select("event_type", "n", "total_value").as[(String, Long, Double)]
        .collect().toSet
      assert(rows.contains(("click", 2L, 3.0)))
      assert(rows.contains(("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("date-rotated streaming sink writes daily partitions (K7)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("stream").toString
    val source = MemoryStream[(Timestamp, String)]
    val stream = source.toDF().toDF("ts", "message")
    source.addData(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "m1"),
      (Timestamp.valueOf("2024-01-02 10:00:00"), "m2"))
    val q = StreamingJobs.dateRotatedWriter(
      EventCleaner.cleanContainerLogs(stream),
      "ts", s"$dir/logs", s"$dir/ckpt").start()
    try q.awaitTermination(30000) finally q.stop()
    val out = spark.read.parquet(s"$dir/logs")
    assert(out.select("event_date").distinct().as[String].collect().sorted.toSeq ===
      Seq("2024.01.01", "2024.01.02"))
    assert(out.filter($"log_data" === $"message").count() === 2)
  }

  test("alert listener fires on termination (T7)") {
    implicit val sqlCtx = spark.sqlContext
    val hook = new graft.sinks.Sinks.RecordingAlertHook
    val listener = new StreamingJobs.AlertListener(hook)
    spark.streams.addListener(listener)
    try {
      val source = MemoryStream[Int]
      val q = source.toDF().writeStream.format("memory").queryName("alerted")
        .outputMode("append").start()
      source.addData(1, 2, 3)
      q.processAllAvailable()
      q.stop()
      // listener events are async; wait briefly
      val deadline = System.currentTimeMillis() + 10000
      while (hook.sent.size < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(hook.sent.exists(_._1.contains("started")))
      assert(hook.sent.exists(_._1.contains("stopped cleanly")))
    } finally spark.streams.removeListener(listener)
  }
}
