package graft

import java.io.PrintWriter
import java.net.ServerSocket

import org.apache.spark.sql.functions._

import graft.streaming.EventCleaner

/** S11 end-to-end over a REAL network hop: a localhost TCP server feeds
  * Spark's `socket` source (the reference's Beats/TCP line input —
  * docker-elk's logstash.conf TCP pipeline), the lines run the
  * EventCleaner profile chain, and the memory sink must land exactly the
  * reference-style count: valid profiles in, malformed/empty lines
  * dropped. This is the one source family whose transport the in-sandbox
  * suite can exercise for real (Kafka has no broker jar here; HTTP uses a
  * stub client) — every byte below crosses an actual socket. */
class SocketSourceSpec extends SparkSpec {
  import spark.implicits._

  private def profileJson(i: Int): String =
    s"""{"full_name":"user $i","id":"$i","is_new":"true","is_private":"false",""" +
      s""""is_verified":"true","latest_reel_media":"$i","profile_pic_id":"p$i",""" +
      s""""profile_pic_url":"http://x/$i.jpg","username":"u$i"}"""

  test("socket source -> EventCleaner chain -> memory sink, exact count over TCP") {
    val server = new ServerSocket(0) // ephemeral port on loopback
    val port = server.getLocalPort
    val valid = 10
    val feeder = new Thread(() => {
      val client = server.accept()
      val out = new PrintWriter(client.getOutputStream, true)
      (0 until valid).foreach(i => out.println(profileJson(i)))
      out.println("this is not json")       // unparseable -> dropped (P4)
      out.println("{}")                     // empty object -> dropped (P4)
      // empty-STRING field: kept (Logstash only drops truly-empty events),
      // value nullified by the P5 empty-string->null stage
      out.println("""{"full_name":""}""")
      out.flush()
      // keep the connection open; the query is stopped by the test
    }, "socket-feeder")
    feeder.setDaemon(true)
    feeder.start()

    val lines = spark.readStream
      .format("socket")
      .option("host", "127.0.0.1")
      .option("port", port)
      .load() // one `value` string column, exactly like a Beats line input
    val cleaned = EventCleaner.cleanProfiles(lines.select(col("value").as("message")))
    val q = cleaned.writeStream.format("memory").queryName("socket_profiles")
      .outputMode("append").start()
    try {
      // poll: a socket source has no processAllAvailable horizon — the
      // feeder's lines arrive when the OS delivers them
      val expected = valid + 1 // 10 profiles + the empty-string-field event
      val deadline = System.currentTimeMillis() + 60000
      def table() = spark.table("socket_profiles")
      while (table().count() < expected && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
      val rows = table()
        .select($"id", $"username", $"is_new", $"latest_reel_media")
        .as[(Option[String], Option[String], Option[Boolean], Option[Int])]
        .collect()
      assert(rows.length === expected,
        s"expected exactly $expected cleaned rows, got ${rows.length}")
      val profiles = rows.flatMap {
        case (Some(id), Some(u), Some(n), Some(m)) => Some((id.toInt, u, n, m))
        case _ => None
      }.sortBy(_._1)
      assert(profiles.length === valid)
      assert(profiles.head === ((0, "u0", true, 0)))
      assert(profiles.last === ((9, "u9", true, 9)))
      // the empty-string event survived P4 but P5 nullified every field
      assert(rows.count(r => r._1.isEmpty && r._2.isEmpty) === 1)
    } finally {
      q.stop()
      server.close()
    }
  }
}
