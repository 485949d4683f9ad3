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

  /** A dialect-specific prepared statement plus its bind plan: statement
    * parameter position i binds the row column at `bindCols(i)`. Postgres's
    * ON CONFLICT binds each column once; dialects without it (Derby's
    * NOT-EXISTS form) re-bind the pk columns for the existence probe. */
  final case class UpsertStatement(sql: String, bindCols: Seq[Int])
      extends Serializable

  private def checkPk(columns: Seq[String], pk: Seq[String]): Unit =
    require(columns.nonEmpty && pk.nonEmpty && pk.forall(columns.contains),
      s"pk $pk must be a subset of columns $columns")

  /** Postgres-dialect idempotent insert statement. */
  def upsertIgnoreSql(table: String, columns: Seq[String], pk: Seq[String]): String = {
    checkPk(columns, pk)
    val placeholders = Seq.fill(columns.size)("?").mkString(", ")
    s"INSERT INTO $table (${columns.mkString(", ")}) VALUES ($placeholders) " +
      s"ON CONFLICT (${pk.mkString(", ")}) DO NOTHING"
  }

  /** Postgres dialect as an [[UpsertStatement]] (each column binds once). */
  def postgresUpsertIgnore(table: String, columns: Seq[String],
      pk: Seq[String]): UpsertStatement =
    UpsertStatement(upsertIgnoreSql(table, columns, pk), columns.indices)

  /** MySQL/MariaDB dialect: `INSERT IGNORE` is the idiomatic
    * conflict-skipping form and, like Postgres's ON CONFLICT, is atomic —
    * safe under concurrent cross-partition writers. Caveat vs the other
    * dialects: IGNORE suppresses EVERY ignorable error on the row (any
    * unique key, not just the pk; type-coercion warnings), so the skip set
    * can be wider than "pk already present". When only-the-pk semantics
    * matter on MySQL, use [[mysqlUpsertKeepSql]] instead. */
  def mysqlUpsertIgnore(table: String, columns: Seq[String],
      pk: Seq[String]): UpsertStatement = {
    checkPk(columns, pk)
    val placeholders = Seq.fill(columns.size)("?").mkString(", ")
    UpsertStatement(
      s"INSERT IGNORE INTO $table (${columns.mkString(", ")}) VALUES ($placeholders)",
      columns.indices)
  }

  /** MySQL's pk-only no-op alternative: `ON DUPLICATE KEY UPDATE pk = pk`
    * (the classic keep-first idiom — the assignment is a no-op, so the
    * stored row is untouched, matching DO NOTHING semantics without
    * IGNORE's blanket error suppression). */
  def mysqlUpsertKeepSql(table: String, columns: Seq[String],
      pk: Seq[String]): UpsertStatement = {
    checkPk(columns, pk)
    val placeholders = Seq.fill(columns.size)("?").mkString(", ")
    val keep = pk.map(c => s"$c = $table.$c").mkString(", ")
    UpsertStatement(
      s"INSERT INTO $table (${columns.mkString(", ")}) VALUES ($placeholders) " +
        s"ON DUPLICATE KEY UPDATE $keep",
      columns.indices)
  }

  /** ANSI-ish dialect for databases without ON CONFLICT (Derby, DB2):
    * `INSERT ... SELECT ... WHERE NOT EXISTS (pk probe)`. Within one
    * transaction batch rows execute in order, so intra-batch duplicates
    * dedup exactly like the Postgres form. Derby requires parameter types
    * in a SELECT list, hence the per-column CASTs (`columnTypes` are SQL
    * type names aligned with `columns`).
    *
    * CONCURRENCY CAVEAT (unlike the Postgres ON CONFLICT form, which is
    * atomic): two writers carrying the same pk can both pass the NOT
    * EXISTS probe before either commits, and the second insert aborts its
    * task with a duplicate-key error. Under Spark that means cross-
    * partition duplicates are NOT safe with this dialect — pre-aggregate
    * to one row per pk (e.g. `Dedup.exactDedupNarrow` / dropDuplicates on
    * the pk) or repartition by pk so duplicates land in one partition,
    * where the in-order batch semantics above apply. The ON CONFLICT
    * dialect has no such requirement. */
  def derbyUpsertIgnore(table: String, columns: Seq[String],
      columnTypes: Seq[String], pk: Seq[String]): UpsertStatement = {
    checkPk(columns, pk)
    require(columnTypes.size == columns.size,
      s"columnTypes (${columnTypes.size}) must align with columns (${columns.size})")
    val casts = columnTypes.map(t => s"CAST(? AS $t)").mkString(", ")
    val probe = pk.map(c => s"$table.$c = ?").mkString(" AND ")
    val sql = s"INSERT INTO $table (${columns.mkString(", ")}) " +
      s"SELECT $casts FROM SYSIBM.SYSDUMMY1 " +
      s"WHERE NOT EXISTS (SELECT 1 FROM $table WHERE $probe)"
    UpsertStatement(sql, columns.indices ++ pk.map(columns.indexOf))
  }

  /** Stream rows through one prepared statement with batched commits.
    * Returns the number of rows submitted. Exposed for direct testing. */
  def writePartition(rows: Iterator[Row], conn: Connection,
      stmt: UpsertStatement, batchSize: Int): Long = {
    conn.setAutoCommit(false)
    val ps = conn.prepareStatement(stmt.sql)
    val binds = stmt.bindCols.toArray
    try {
      var n = 0L
      var inBatch = 0
      rows.foreach { row =>
        var i = 0
        while (i < binds.length) { ps.setObject(i + 1, row.get(binds(i))); i += 1 }
        ps.addBatch()
        inBatch += 1; n += 1
        if (inBatch >= batchSize) {
          ps.executeBatch(); conn.commit(); inBatch = 0
        }
      }
      if (inBatch > 0) { ps.executeBatch(); conn.commit() }
      n
    } finally ps.close()
  }

  /** One-column-per-parameter convenience overload (Postgres bind order). */
  def writePartition(rows: Iterator[Row], conn: Connection, sql: String,
      nCols: Int, batchSize: Int): Long =
    writePartition(rows, conn, UpsertStatement(sql, 0 until nCols), batchSize)

  /** Distributed idempotent JDBC append with an explicit dialect statement.
    * `connFactory` runs on executors. */
  def upsert(df: DataFrame, stmt: UpsertStatement,
      connFactory: () => Connection, batchSize: Int = 1000): Unit =
    df.foreachPartition { rows: Iterator[Row] =>
      val conn = connFactory()
      try { writePartition(rows, conn, stmt, batchSize); () }
      finally conn.close()
    }

  /** Distributed idempotent JDBC append (Postgres dialect — the reference's
    * literal write path). */
  def upsertIgnore(df: DataFrame, table: String, pk: Seq[String],
      connFactory: () => Connection, batchSize: Int = 1000): Unit =
    upsert(df, postgresUpsertIgnore(table, df.columns.toSeq, pk),
      connFactory, batchSize)
}
