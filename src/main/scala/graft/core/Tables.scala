package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Registry of the fixture tables (see /root/repo/TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst's column pruning and
  * predicate pushdown reach the file source (`PushedFilters` / `ReadSchema`
  * in `.explain("formatted")`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** Normalize `ts` to TimestampType whatever physical shape the fixture
    * carries. Generations seen so far:
    *   - TIMESTAMP(NANOS): Spark reads it as nanos-long (GraftSession's
    *     nanosAsLong) — truncate to microseconds, exactly what DuckDB's
    *     parquet reader does. `div` is integer division (post-1970 values).
    *   - timestamp[us] without the UTC-adjusted flag: Spark reads it as
    *     TIMESTAMP_NTZ — cast to TIMESTAMP, lossless because the session
    *     timezone is pinned UTC (GraftSession), and DuckDB treats the
    *     column as naive/UTC anyway. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
