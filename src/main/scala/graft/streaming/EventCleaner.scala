package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's Logstash filter chain (instagram-profiles.conf:10-59) as
  * one reusable, stateless Structured-Streaming-safe transform:
  *
  *   json parse (F11) → drop empty events (P4) → flatten/rename ×9 (F12) →
  *   type casts ×4 (F13) → drop raw message (F15) → empty-string→null ×9 (P5)
  *
  * Works identically on batch and streaming DataFrames (pure projection +
  * filter — no state, no watermark needed; SURVEY T3).
  *
  * Deliberate semantic deviation (SURVEY §7.4 risk 5): Logstash *removes*
  * empty fields from the event; a relational schema keeps the column and
  * nullifies the value.
  */
object EventCleaner {

  /** Raw instagram-profile JSON schema — all strings, as Logstash receives
    * them; typed casts happen in the chain (conf:38-43). */
  val profileRawSchema: StructType = StructType(Seq(
    "full_name", "id", "is_new", "is_private", "is_verified",
    "latest_reel_media", "profile_pic_id", "profile_pic_url", "username")
    .map(StructField(_, StringType)))

  private val boolFields = Seq("is_new", "is_private", "is_verified")
  private val intFields  = Seq("latest_reel_media")
  private val stringFields = Seq("full_name", "id", "profile_pic_id",
    "profile_pic_url", "username")

  private def emptyToNull(c: Column): Column =
    when(length(trim(c)) === 0, lit(null)).otherwise(c)

  /** messageCol holds the raw JSON event string. */
  def cleanProfiles(df: DataFrame, messageCol: String = "message"): DataFrame = {
    val parsed = df.withColumn("parsed_data",
      from_json(col(messageCol), profileRawSchema))
    // P4: `if ![parsed_data] or [parsed_data] == {}` — unparseable JSON or an
    // object with no non-null field.
    val nonEmpty = parsed.filter(col("parsed_data").isNotNull &&
      profileRawSchema.fieldNames.toSeq
        .map(f => col(s"parsed_data.$f").isNotNull).reduce(_ || _))
    val flattened = nonEmpty.select(
      (stringFields.map(f => emptyToNull(col(s"parsed_data.$f")).as(f)) ++
        boolFields.map(f => emptyToNull(col(s"parsed_data.$f")).cast(BooleanType).as(f)) ++
        intFields.map(f => emptyToNull(col(s"parsed_data.$f")).cast(IntegerType).as(f))): _*)
    flattened.select(profileRawSchema.fieldNames.toIndexedSeq.map(col): _*)
  }

  /** container-logs.conf:10-18 chain: parse → copy message into log_data
    * (F14) → keep event time. */
  def cleanContainerLogs(df: DataFrame, messageCol: String = "message",
      tsCol: String = "ts"): DataFrame =
    df.select(
      col(messageCol).as("message"),
      col(messageCol).as("log_data"),
      col(tsCol).as("ts"))
}
