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

  test("dialect seam: generated SQL per dialect over the same (table, columns, pk)") {
    val (t, cols, pk) = ("daily_candles",
      Seq("market", "candle_date_time_kst", "trade_price"),
      Seq("market", "candle_date_time_kst"))
    val pg = JdbcUpsert.postgresUpsertIgnore(t, cols, pk)
    assert(pg.sql.endsWith("ON CONFLICT (market, candle_date_time_kst) DO NOTHING"))
    assert(pg.bindCols === Seq(0, 1, 2), "each column binds exactly once")
    val my = JdbcUpsert.mysqlUpsertIgnore(t, cols, pk)
    assert(my.sql === "INSERT IGNORE INTO daily_candles " +
      "(market, candle_date_time_kst, trade_price) VALUES (?, ?, ?)")
    assert(my.bindCols === Seq(0, 1, 2))
    val myKeep = JdbcUpsert.mysqlUpsertKeepSql(t, cols, pk)
    assert(myKeep.sql === "INSERT INTO daily_candles " +
      "(market, candle_date_time_kst, trade_price) VALUES (?, ?, ?) " +
      "ON DUPLICATE KEY UPDATE market = daily_candles.market, " +
      "candle_date_time_kst = daily_candles.candle_date_time_kst")
    assert(myKeep.bindCols === Seq(0, 1, 2))
    val derby = JdbcUpsert.derbyUpsertIgnore(t, cols,
      Seq("VARCHAR(16)", "TIMESTAMP", "DOUBLE"), pk)
    assert(derby.sql.contains("WHERE NOT EXISTS"))
    assert(derby.bindCols === Seq(0, 1, 2, 0, 1),
      "NOT-EXISTS probe re-binds the pk columns after the value list")
    // pk-not-in-columns rejected uniformly across dialects
    intercept[IllegalArgumentException](JdbcUpsert.mysqlUpsertIgnore("t", Seq("a"), Seq("b")))
    intercept[IllegalArgumentException](JdbcUpsert.mysqlUpsertKeepSql("t", Seq("a"), Seq("b")))
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

  // ---- live embedded-Derby round trip (a real database, no mocks) ----

  private val derbyUrl = "jdbc:derby:memory:graftUpsert"

  private def derbyConn(): java.sql.Connection =
    java.sql.DriverManager.getConnection(derbyUrl + ";create=true")

  test("live Derby upsert-ignore: write twice, count once") {
    import spark.implicits._
    // keep derby.log out of the repo
    System.setProperty("derby.system.home", sys.props("java.io.tmpdir"))
    val setup = derbyConn()
    try setup.createStatement().execute(
      "CREATE TABLE daily_candles (market VARCHAR(20) NOT NULL, " +
        "candle_date VARCHAR(10) NOT NULL, trade_price DOUBLE, " +
        "PRIMARY KEY (market, candle_date))")
    finally setup.close()

    val stmt = JdbcUpsert.derbyUpsertIgnore("daily_candles",
      Seq("market", "candle_date", "trade_price"),
      Seq("VARCHAR(20)", "VARCHAR(10)", "DOUBLE"),
      Seq("market", "candle_date"))
    val df = Seq(
      ("KRW-BTC", "2024-01-01", 83000000.0),
      ("KRW-BTC", "2024-01-02", 84100000.0),
      ("KRW-ETH", "2024-01-01", 3900000.0)).toDF("market", "candle_date", "trade_price")

    def tableCount(): Long = {
      val c = derbyConn()
      try {
        val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM daily_candles")
        rs.next(); rs.getLong(1)
      } finally c.close()
    }

    val factory = () => java.sql.DriverManager.getConnection(
      "jdbc:derby:memory:graftUpsert")
    JdbcUpsert.upsert(df, stmt, factory, batchSize = 2)
    assert(tableCount() === 3, "first write inserts all rows")
    // the reference's core semantic: re-running the batch is a no-op
    JdbcUpsert.upsert(df, stmt, factory, batchSize = 2)
    assert(tableCount() === 3, "identical second write inserts nothing")
    // overlapping batch: only the genuinely new row lands
    val overlap = Seq(
      ("KRW-BTC", "2024-01-02", 99999999.0), // pk exists -> ignored
      ("KRW-XRP", "2024-01-01", 700.0)).toDF("market", "candle_date", "trade_price")
    JdbcUpsert.upsert(overlap, stmt, factory, batchSize = 2)
    assert(tableCount() === 4)
    // ignored means original value kept, not overwritten
    val c = derbyConn()
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT trade_price FROM daily_candles " +
          "WHERE market = 'KRW-BTC' AND candle_date = '2024-01-02'")
      rs.next()
      assert(rs.getDouble(1) === 84100000.0)
    } finally c.close()
  }

  test("live Derby: intra-batch duplicates dedup like ON CONFLICT") {
    import spark.implicits._
    System.setProperty("derby.system.home", sys.props("java.io.tmpdir"))
    val setup = java.sql.DriverManager.getConnection(
      "jdbc:derby:memory:graftDup;create=true")
    try setup.createStatement().execute(
      "CREATE TABLE t (id INT NOT NULL, v VARCHAR(10), PRIMARY KEY (id))")
    finally setup.close()
    val stmt = JdbcUpsert.derbyUpsertIgnore("t",
      Seq("id", "v"), Seq("INT", "VARCHAR(10)"), Seq("id"))
    // same pk twice within one partition/batch: first wins, second ignored
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("id", "v").coalesce(1)
    JdbcUpsert.upsert(df, stmt,
      () => java.sql.DriverManager.getConnection("jdbc:derby:memory:graftDup"),
      batchSize = 10)
    val c = java.sql.DriverManager.getConnection("jdbc:derby:memory:graftDup")
    try {
      val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM t")
      rs.next(); assert(rs.getLong(1) === 2)
    } finally c.close()
  }
}
