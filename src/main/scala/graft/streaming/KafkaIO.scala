package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType

import graft.sinks.Sinks

/** Kafka source/sink assembly (SURVEY S4/K3/T1).
  *
  * Requires the spark-sql-kafka connector on the deployment classpath (not
  * present in this zero-egress test container, so these builders are
  * exercised as far as plan construction; the transform chains they wrap —
  * EventCleaner, kafkaShaped — are fully tested through MemoryStream).
  *
  * Mapping from the reference (instagram-profiles.conf:2-8):
  *   bootstrap_servers -> kafka.bootstrap.servers
  *   topics            -> subscribe
  *   group_id          -> replaced by the checkpoint dir (offset tracking)
  *   codec json        -> from_json over value
  */
object KafkaIO {

  /** Streaming source: subscribe + decode JSON values against a declared
    * schema (never inferred on streams). */
  def jsonSource(spark: SparkSession, servers: String, topic: String,
      schema: StructType, startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(
        col("key").cast("string").as("key"),
        from_json(col("value").cast("string"), schema).as("data"),
        col("timestamp").as("kafka_ts"))
      .select(col("key"), col("data.*"), col("kafka_ts"))

  /** Streaming sink: key + whole-row JSON value (send_to_kafka.py:14-16). */
  def keyedJsonSink(df: DataFrame, servers: String, topic: String,
      keyCol: String, checkpoint: String): DataStreamWriter[Row] =
    Sinks.kafkaShaped(df, keyCol)
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
}
