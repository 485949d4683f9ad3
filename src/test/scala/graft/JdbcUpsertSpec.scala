package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement}

import org.apache.spark.sql.Row

import graft.sinks.JdbcUpsert

/** JDBC upsert sink tested against a recording java.sql proxy (no database
  * in this environment; the protocol — statement shape, batch grouping,
  * commit cadence — is what the sink owns). */
class JdbcUpsertSpec extends SparkSpec {

  test("upsert SQL has ON CONFLICT DO NOTHING over the pk") {
    val sql = JdbcUpsert.upsertIgnoreSql("daily_candles",
      Seq("market", "candle_date_time_kst", "trade_price"),
      Seq("market", "candle_date_time_kst"))
    assert(sql === "INSERT INTO daily_candles (market, candle_date_time_kst, trade_price) " +
      "VALUES (?, ?, ?) ON CONFLICT (market, candle_date_time_kst) DO NOTHING")
    intercept[IllegalArgumentException] {
      JdbcUpsert.upsertIgnoreSql("t", Seq("a"), Seq("b")) // pk not in columns
    }
  }

  /** Recording fake of Connection + PreparedStatement via dynamic proxy. */
  private class Recorder {
    val events = scala.collection.mutable.ArrayBuffer.empty[String]
    private val stmtHandler = new InvocationHandler {
      override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
        case "setObject" => events += s"set(${args(0)},${args(1)})"; null
        case "addBatch" => events += "addBatch"; null
        case "executeBatch" => events += "executeBatch"; Array.emptyIntArray
        case "close" => events += "closeStmt"; null
        case _ => null
      }
    }
    private val connHandler = new InvocationHandler {
      override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
        case "prepareStatement" => events += s"prepare(${args(0)})"
          Proxy.newProxyInstance(getClass.getClassLoader,
            Array(classOf[PreparedStatement]), stmtHandler)
        case "setAutoCommit" => events += s"autoCommit(${args(0)})"; null
        case "commit" => events += "commit"; null
        case "close" => events += "closeConn"; null
        case _ => null
      }
    }
    val conn: Connection = Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[Connection]), connHandler).asInstanceOf[Connection]
  }

  test("writePartition batches every N rows and commits per batch + tail") {
    val rec = new Recorder
    val rows = (1 to 7).map(i => Row(i, s"v$i")).iterator
    val n = JdbcUpsert.writePartition(rows, rec.conn,
      "INSERT ...", nCols = 2, batchSize = 3)
    assert(n === 7)
    val batches = rec.events.count(_ == "executeBatch")
    val commits = rec.events.count(_ == "commit")
    assert(batches === 3, "3 + 3 + 1 rows -> 3 executeBatch calls")
    assert(commits === 3)
    assert(rec.events.count(_ == "addBatch") === 7)
    // every row set both columns
    assert(rec.events.count(_.startsWith("set(1,")) === 7)
    assert(rec.events.count(_.startsWith("set(2,")) === 7)
    assert(rec.events.last === "closeStmt")
  }

  test("writePartition with empty iterator executes nothing") {
    val rec = new Recorder
    val n = JdbcUpsert.writePartition(Iterator.empty, rec.conn, "X", 1, 10)
    assert(n === 0)
    assert(!rec.events.contains("executeBatch"))
  }
}
