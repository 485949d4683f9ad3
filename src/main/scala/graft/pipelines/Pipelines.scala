package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Schemas.UpbitMarket
import graft.sinks.Sinks
import graft.sources.FakeDataGenerator

/** The reference's three pipeline lifecycles (SURVEY §3) recomposed as
  * single Spark driver programs. Airflow's scheduler→worker dispatch becomes
  * Spark task scheduling; XCom becomes a DataFrame handle; per-row JDBC
  * loops become one distributed keyed-idempotent write.
  */
object Pipelines {

  /** §3.1 Entry point A — fake-data batch ETL
    * (data_generate_send_postgres_alert_slack.py:127-154):
    * generate n users → idempotent keyed append → alert. */
  def fakeDataPipeline(spark: SparkSession, n: Long, tablePath: String,
      hook: Sinks.AlertHook, seed: Long = 42L): Unit =
    Sinks.withAlerts(hook, "fake_data_pipeline") {
      val users = FakeDataGenerator.users(spark, n, seed).toDF()
      Sinks.upsertIgnoreParquet(users, tablePath, Seq("uuid"))
    }

  /** §3.2 Entry point B — ingest + relational combine
    * (upbit_data_pipeline.py:239-271). `markets`/`prices` arrive from any
    * source (HTTP helper, CSV, fixtures); the combine step is the part the
    * reference delegated to Postgres and the engine now plans natively:
    * broadcast-hash inner join + projection, materialized as a table. */
  def combineMarketAndPrices(markets: DataFrame, prices: DataFrame): DataFrame =
    markets.join(prices, Seq("market"), "inner")
      .select(col("market"), col("korean_name"), col("english_name"),
        col("trade_price"), col("trade_volume"))

  def upbitIngestPipeline(spark: SparkSession, markets: DataFrame,
      prices: DataFrame, marketsPath: String, pricesPath: String,
      combinedPath: String, hook: Sinks.AlertHook): Unit =
    Sinks.withAlerts(hook, "upbit_data_pipeline") {
      Sinks.upsertIgnoreParquet(markets, marketsPath, Seq("market"))
      Sinks.upsertIgnoreParquet(prices, pricesPath, Seq("market"))
      val storedMarkets = spark.read.parquet(marketsPath)
      val storedPrices = spark.read.parquet(pricesPath)
      // CTAS (K9): overwrite-materialize the join result
      combineMarketAndPrices(storedMarkets, storedPrices)
        .write.mode("overwrite").parquet(combinedPath)
    }

  /** §3.3 Entry point C — streaming profile ETL: see
    * graft.streaming.EventCleaner (transform) + StreamingJobs (assembly);
    * exercised end-to-end in StreamingSpec with a memory source/sink. */
}
