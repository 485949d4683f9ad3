package graft.sinks

import java.sql.{Connection, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Row}

/** JDBC upsert-ignore sink — the reference's literal write path
  * (`INSERT .. ON CONFLICT (pk) DO NOTHING` with batched commits:
  * upbit_data_pipeline.py:35-41, etl_pipeline.py:63-70 commit_every=1000).
  *
  * Distributed form: `df.foreachPartition` — each executor task opens its
  * own connection via `connFactory` (must be a serializable thunk), streams
  * its partition through one PreparedStatement in addBatch/executeBatch
  * groups, commits per batch. Contrast with the reference, which inserts
  * row-at-a-time from a single worker.
  *
  * The engine-native alternative when no RDBMS is involved is
  * [[Sinks.upsertIgnoreParquet]] (left-anti + append).
  */
object JdbcUpsert {

  /** Postgres-dialect idempotent insert statement. */
  def upsertIgnoreSql(table: String, columns: Seq[String], pk: Seq[String]): String = {
    require(columns.nonEmpty && pk.nonEmpty && pk.forall(columns.contains),
      s"pk $pk must be a subset of columns $columns")
    val placeholders = Seq.fill(columns.size)("?").mkString(", ")
    s"INSERT INTO $table (${columns.mkString(", ")}) VALUES ($placeholders) " +
      s"ON CONFLICT (${pk.mkString(", ")}) DO NOTHING"
  }

  /** Stream rows through one prepared statement with batched commits.
    * Returns the number of rows submitted. Exposed for direct testing. */
  def writePartition(rows: Iterator[Row], conn: Connection, sql: String,
      nCols: Int, batchSize: Int): Long = {
    conn.setAutoCommit(false)
    val stmt = conn.prepareStatement(sql)
    try {
      var n = 0L
      var inBatch = 0
      rows.foreach { row =>
        var i = 0
        while (i < nCols) { stmt.setObject(i + 1, row.get(i)); i += 1 }
        stmt.addBatch()
        inBatch += 1; n += 1
        if (inBatch >= batchSize) {
          stmt.executeBatch(); conn.commit(); inBatch = 0
        }
      }
      if (inBatch > 0) { stmt.executeBatch(); conn.commit() }
      n
    } finally stmt.close()
  }

  /** Distributed idempotent JDBC append. `connFactory` runs on executors. */
  def upsertIgnore(df: DataFrame, table: String, pk: Seq[String],
      connFactory: () => Connection, batchSize: Int = 1000): Unit = {
    val columns = df.columns.toSeq
    val sql = upsertIgnoreSql(table, columns, pk)
    val nCols = columns.size
    df.foreachPartition { rows: Iterator[Row] =>
      val conn = connFactory()
      try { writePartition(rows, conn, sql, nCols, batchSize); () }
      finally conn.close()
    }
  }
}
