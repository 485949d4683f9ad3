package graft.core

import java.sql.{Date, Timestamp}

/** Typed schemas for the reference's core tables (SURVEY.md §1.3), one case
  * class per table so `Dataset[T]` gives compile-time field checks.
  *
  * Reference DDL: upbit_markets/upbit_prices airflow/dags/upbit_data_pipeline.py:25-31,68-93;
  * daily_candles api_rapid/insert_csv_to_postgres.py:30-42;
  * fake_user airflow/modules/generate_fake_data.py:7-25;
  * instagram profile docker-elk/logstash/pipeline/instagram-profiles.conf:24-43;
  * container log docker-elk/logstash/pipeline/container-logs.conf:10-18;
  * target_table airflow/dags/etl_pipeline.py:82-89.
  */
object Schemas {

  case class UpbitMarket(market: String, korean_name: String, english_name: String)

  case class DailyCandle(
      market: String,
      candle_date_time_kst: Timestamp,
      opening_price: Double,
      high_price: Double,
      low_price: Double,
      trade_price: Double,
      candle_acc_trade_volume: Double)

  case class UpbitPrice(
      market: String,
      trade_date: Date,
      trade_time: String,
      trade_price: Double,
      opening_price: Double,
      high_price: Double,
      low_price: Double,
      prev_closing_price: Double,
      change: String,
      change_price: Double,
      change_rate: Double,
      trade_volume: Double,
      acc_trade_price: Double,
      acc_trade_price_24h: Double,
      acc_trade_volume: Double,
      acc_trade_volume_24h: Double,
      highest_52_week_price: Double,
      highest_52_week_date: Date,
      lowest_52_week_price: Double,
      lowest_52_week_date: Date,
      timestamp: Long)

  case class FakeUser(
      uuid: String,
      name: String,
      job: String,
      residence: String,
      blood_group: String,
      sex: String,
      birthdate: String, // "yyyyMMdd", matches generate_fake_data.py:22
      phone_number: String,
      email: String,
      timestamp: Timestamp)

  case class InstagramProfile(
      full_name: Option[String],
      id: Option[String],
      is_new: Option[Boolean],
      is_private: Option[Boolean],
      is_verified: Option[Boolean],
      latest_reel_media: Option[Int],
      profile_pic_id: Option[String],
      profile_pic_url: Option[String],
      username: Option[String])

  case class ContainerLog(message: String, log_data: String, ts: Timestamp)

  case class TargetRow(id: Long, name: String, value: Double, timestamp: Timestamp)
}
