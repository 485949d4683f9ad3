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
}
