package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables
import Exact._

/** Time-series / candle analytics — SURVEY.md §2.5 A4-A6, §2.6 W1-W3,
  * §2.10 T4, plus the scalar date/json function surface (F1-F3, F11, F13).
  *
  * The reference consumes these metrics precomputed (24 h accumulated sums,
  * 52-week extremes, daily OHLCV candles from the Upbit API); here the engine
  * computes them itself over the `events` fixture.
  *
  * Scale notes:
  *  - Rolling range-frame windows (q12/q13) shuffle once on the partition key
  *    (user_id) and sort within partitions — the same plan shape a 1000-node
  *    cluster wants; state is bounded by the frame, not the partition.
  *  - Tumbling buckets (q14) are a plain hash aggregate: partial map-side
  *    combine keeps the shuffle small no matter how many raw events.
  */
object TimeSeriesQueries extends QueryModule {

  /** Daily OHLCV candles per user (A6). Deterministic open/close via
    * row_number over (ts, event_id) — `first/last` in plain aggregates are
    * order-nondeterministic (SURVEY §7.4 risk 2). */
  private def q11Ohlcv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.TimeSeriesOps.ohlcv(
        Tables.events(spark, dir),
        keyCol = "user_id", tsCol = "ts", valueCol = "value",
        tieCol = "event_id", volumeAgg = c => dsum(c))
      .select($"user_id", $"bucket".as("day"), $"open", $"high", $"low",
        $"close", $"volume", $"n".as("n_events"))
      .orderBy($"user_id", $"day")
  }

  private val q11Sql =
    s"""SELECT user_id, day,
       |  MAX(CASE WHEN rna = 1 THEN value END) AS open,
       |  MAX(value) AS high,
       |  MIN(value) AS low,
       |  MAX(CASE WHEN rnd = 1 THEN value END) AS close,
       |  ${sqlDsum("value")} AS volume,
       |  COUNT(*) AS n_events
       |FROM (
       |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, value,
       |    row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
       |                       ORDER BY ts ASC, event_id ASC) AS rna,
       |    row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
       |                       ORDER BY ts DESC, event_id DESC) AS rnd
       |  FROM events)
       |GROUP BY user_id, day
       |ORDER BY user_id, day""".stripMargin

  /** Rolling 24 h accumulated sums per user (A4: acc_*_24h engine-side).
    * Event-time range frame on epoch-micros. */
  private def q12Rolling24h(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.TimeSeriesOps.rolling(
        Tables.events(spark, dir), "user_id", "ts", windowSec = 24L * 3600)(
        "acc_value_24h_dec" -> sum($"value".cast("decimal(18,4)")),
        "acc_events_24h" -> count(lit(1)))
      .withColumn("acc_value_24h", $"acc_value_24h_dec".cast("double"))
      .select($"event_id", $"user_id", $"acc_value_24h", $"acc_events_24h")
      .orderBy($"event_id")
  }

  /** Rolling anomaly flags (monitoring): each event vs its user's
    * trailing 24 h — the z-score test cross-multiplied into exact
    * integer arithmetic (no float μ/σ; see TimeSeriesOps
    * .rollingAnomalies). Oracle: the same moments in HUGEINT over
    * q12's pinned range frame. */
  private def q106Anomalies(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.TimeSeriesOps.rollingAnomalies(
        Tables.events(spark, dir), "user_id", "ts", "value",
        windowSec = 86400L, z = 3)
      .select($"event_id", $"user_id", $"value", $"win_n", $"is_anomaly")
      .orderBy($"event_id")
  }

  private val q106Sql =
    """WITH t AS (
      |  SELECT event_id, user_id, value, ts,
      |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS HUGEINT) AS x
      |  FROM events),
      |w AS (
      |  SELECT event_id, user_id, value, x,
      |    SUM(x) OVER win AS s,
      |    SUM(x * x) OVER win AS q,
      |    CAST(COUNT(*) OVER win AS HUGEINT) AS n
      |  FROM t
      |  WINDOW win AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |                 RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id, value, CAST(n AS BIGINT) AS win_n,
      |  (n * x - s) * (n * x - s) > 9 * (n * q - s * s) AS is_anomaly
      |FROM w
      |ORDER BY event_id""".stripMargin

  private val q12Sql =
    """SELECT event_id, user_id,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS VARCHAR) AS DOUBLE) AS acc_value_24h,
      |  COUNT(*) OVER w AS acc_events_24h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Rolling 7-day extremes per user (A5: 52-week-high/low shape at the
    * fixture's time scale). */
  private def q13RollingExtremes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val weekUs = 7L * 24 * 3600 * 1000000
    val w = Window.partitionBy($"user_id").orderBy($"us").rangeBetween(-weekUs, 0)
    Tables.events(spark, dir)
      .withColumn("us", graft.operators.TimeSeriesOps.eventMicros($"ts"))
      .withColumn("high_7d", max($"value").over(w))
      .withColumn("low_7d", min($"value").over(w))
      .select($"event_id", $"user_id", $"high_7d", $"low_7d")
      .orderBy($"event_id")
  }

  private val q13Sql =
    """SELECT event_id, user_id,
      |  MAX(value) OVER w AS high_7d,
      |  MIN(value) OVER w AS low_7d
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Daily tumbling buckets per event type (T4/W2 — the engine-side form of
    * the reference's `container-logs-%{+YYYY.MM.dd}` index rotation). */
  private def q14DailyBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "1 day"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .select(
        date_format($"window.start", "yyyy-MM-dd").as("day"),
        $"event_type", $"n", $"total_value")
      .orderBy($"day", $"event_type")
  }

  private val q14Sql =
    s"""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       |  COUNT(*) AS n,
       |  ${sqlDsum("value")} AS total_value
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY day, event_type""".stripMargin

  /** JSON parse + typed extraction (F11/F13 — the Logstash
    * `json {} + mutate convert` chain, relationally). */
  private def q15JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .groupBy($"event_type")
      .agg(
        sum($"k").as("sum_k"),
        max($"k").as("max_k"),
        count($"k").as("n_k"))
      .orderBy($"event_type")
  }

  private val q15Sql =
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
      |  COUNT(CAST(json_extract_string(props, '$.k') AS INT)) AS n_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Scalar date-function surface (F1 format, F2 parse, F3 arithmetic, W2
    * bucket keys) — row-level, no aggregation. */
  private def q16DateFunctions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"event_id" < 2000)
      .select(
        $"event_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        date_format($"ts", "yyyyMMdd").as("day_key"),
        date_format($"ts" - expr("INTERVAL 1 DAY"), "yyyy-MM-dd").as("prev_day"),
        hour($"ts").as("hr"),
        (dayofweek($"ts") - 1).as("dow"))
      .orderBy($"event_id")
  }

  private val q16Sql =
    """SELECT event_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
      |  strftime(ts, '%Y%m%d') AS day_key,
      |  strftime(ts - INTERVAL 1 DAY, '%Y-%m-%d') AS prev_day,
      |  CAST(strftime(ts, '%H') AS INT) AS hr,
      |  CAST(strftime(ts, '%w') AS INT) AS dow
      |FROM events
      |WHERE event_id < 2000
      |ORDER BY event_id""".stripMargin

  /** Keyed dedup keeping the earliest row (T2/A2 — the streaming
    * `dropDuplicates("uuid")` semantic, made deterministic). */
  private def q17EventDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts".asc, $"event_id".asc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("first_ts"))
      .orderBy($"user_id", $"event_type")
  }

  private val q17Sql =
    """SELECT user_id, event_type, event_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
      |                               ORDER BY ts ASC, event_id ASC) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  /** Offset window functions (lead/lag) + running delta per series. */
  private def q33LeadLag(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(spark, dir)
      .filter($"user_id" < 5)
      .withColumn("prev_value", lag($"value", 1).over(w))
      .withColumn("next_value", lead($"value", 1).over(w))
      .withColumn("delta", $"value" - $"prev_value")
      .select($"event_id", $"user_id", $"value", $"prev_value", $"next_value", $"delta")
      .orderBy($"event_id")
  }

  private val q33Sql =
    """SELECT event_id, user_id, value,
      |  lag(value, 1) OVER w AS prev_value,
      |  lead(value, 1) OVER w AS next_value,
      |  value - lag(value, 1) OVER w AS delta
      |FROM events
      |WHERE user_id < 5
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |ORDER BY event_id""".stripMargin

  /** Interval (range) join via time-binning: every view a user made in the
    * six hours before each of their clicks — the event-correlation op.
    * [[graft.operators.IntervalJoin]] turns the inequality predicate into
    * an equi-join on (user, 6h-bin) with a 2× left fan-out, so compared
    * pairs are bounded by events-per-window, not events-per-user; the
    * oracle states the same join relationally (DuckDB's IEJoin handles the
    * inequality natively — exactly the formulation that does NOT scale as
    * a Spark residual-filter join on a hot key). */
  private def q73IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val clicks = events.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("click_user"),
        $"ts".as("click_ts"))
    val views = events.filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id".as("view_user"),
        $"ts".as("view_ts"))
    graft.operators.IntervalJoin.joinWithin(clicks, views,
        "click_user", "view_user", "click_ts", "view_ts",
        lowerSec = -21600L, upperSec = 0L)
      .select($"click_id", $"view_id", $"click_user".as("user_id"))
      .orderBy($"click_id", $"view_id")
  }

  private val q73Sql =
    """SELECT a.event_id AS click_id, b.event_id AS view_id,
      |  a.user_id AS user_id
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND a.event_type = 'click' AND b.event_type = 'view'
      | AND b.ts >= a.ts - INTERVAL 6 HOUR AND b.ts < a.ts
      |ORDER BY click_id, view_id""".stripMargin

  /** UNKEYED interval join: every click (from ANY user) in the five
    * minutes before each purchase — global time-window correlation, the
    * range-join shape [[graft.operators.IntervalJoin.joinWithin]] cannot
    * express (its equi-key is required). The bin IS the whole equi-key;
    * compared pairs are bounded by global event density inside one window
    * span. The oracle is DuckDB's native IEJoin over the same predicate. */
  private def q78GlobalWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"ts".as("purchase_ts"))
    val clicks = events.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("click_user"),
        $"ts".as("click_ts"))
    graft.operators.IntervalJoin.joinWithinAll(purchases, clicks,
        "purchase_ts", "click_ts", lowerSec = -300L, upperSec = 0L)
      .select($"purchase_id", $"click_id", $"click_user")
      .orderBy($"purchase_id", $"click_id")
  }

  private val q78Sql =
    """SELECT a.event_id AS purchase_id, b.event_id AS click_id,
      |  b.user_id AS click_user
      |FROM events a JOIN events b
      |  ON a.event_type = 'purchase' AND b.event_type = 'click'
      | AND b.ts >= a.ts - INTERVAL 5 MINUTE AND b.ts < a.ts
      |ORDER BY purchase_id, click_id""".stripMargin

  /** Fixed-point EWMA smoothing (north star): each user's value series
    * smoothed with α = 1/8 in pure integer arithmetic
    * (TimeSeriesOps.ewma — one groupBy shuffle + a row-local sorted
    * fold; a float EWMA would drift per multiply order, the floor
    * recurrence is bit-identical everywhere). Oracle: the recurrence
    * replayed as a recursive-CTE walk per user with DuckDB's `//`
    * floor division — an entirely different evaluation strategy
    * reaching the same integers. */
  /** Holt level+trend smoothing ([[graft.operators.TimeSeriesOps.holt]],
    * α = 1/8, β = 1/16): q118's recurrence with an explicit trend and a
    * one-step forecast, in the same floor fixed-point — every (level,
    * trend, forecast) integer replays exactly as a recursive-CTE walk
    * with DuckDB's `//` floor division. */
  private def q202Holt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.TimeSeriesOps.holt(Tables.events(spark, dir),
        "user_id", "ts", "event_id", "value")
      .orderBy($"user_id", $"rn")
  }

  private val q202Sql = {
    // FLOOR division for any sign: DuckDB's `//` truncates toward zero
    // on negatives (the q118 EWMA never went negative, Holt's trend
    // does), so subtract the positive modulus first — the numerator
    // becomes exactly divisible and truncation equals floor
    def fdiv(n: String, w: Int) = s"(($n) - ((($n) % $w) + $w) % $w) // $w"
    val lnum = "o.vu + 7 * (w.l + w.b)"
    val l2 = fdiv(lnum, 8)
    val bnum = s"($l2 - w.l) + 15 * w.b"
    s"""WITH RECURSIVE ord AS (
       |  SELECT user_id,
       |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vu,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM events),
       |walk AS (
       |  SELECT user_id, rn, vu, vu AS l, CAST(0 AS BIGINT) AS b FROM ord WHERE rn = 1
       |  UNION ALL
       |  SELECT o.user_id, o.rn, o.vu,
       |    $l2,
       |    ${fdiv(bnum, 16)}
       |  FROM walk w JOIN ord o ON o.user_id = w.user_id AND o.rn = w.rn + 1)
       |SELECT user_id, rn, vu, l AS level, b AS trend, l + b AS forecast
       |FROM walk
       |ORDER BY user_id, rn""".stripMargin
  }

  /** Holt–Winters additive smoothing ([[graft.operators.TimeSeriesOps
    * .holtWinters]], period 4, α=1/8, β=1/16, γ=1/8): level, trend, and
    * a rotating 4-lane seasonal state, all in floor fixed-point; the
    * oracle walks the same recurrence as a recursive CTE carrying the
    * seasonal LIST as state (head = the lane due this step), with the
    * sign-safe floor-division form throughout. */
  private def q204HoltWinters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.TimeSeriesOps.holtWinters(Tables.events(spark, dir),
        "user_id", "ts", "event_id", "value", period = 4)
      .orderBy($"user_id", $"rn")
  }

  private val q204Sql = {
    def fdiv(n: String, w: Int) = s"(($n) - ((($n) % $w) + $w) % $w) // $w"
    val l2 = fdiv("(o.vu - w.sea[1]) + 7 * (w.l + w.b)", 8)
    val b2 = fdiv(s"($l2 - w.l) + 15 * w.b", 16)
    val s2 = fdiv(s"(o.vu - $l2) + 7 * w.sea[1]", 8)
    s"""WITH RECURSIVE ord AS (
       |  SELECT user_id,
       |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vu,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM events),
       |walk AS (
       |  SELECT user_id, rn, vu, vu AS l, CAST(0 AS BIGINT) AS b,
       |    CAST(0 AS BIGINT) AS s,
       |    [CAST(0 AS BIGINT), 0, 0, 0] AS sea
       |  FROM ord WHERE rn = 1
       |  UNION ALL
       |  SELECT o.user_id, o.rn, o.vu,
       |    $l2, $b2, $s2,
       |    list_append(w.sea[2:4], $s2)
       |  FROM walk w JOIN ord o ON o.user_id = w.user_id AND o.rn = w.rn + 1)
       |SELECT user_id, rn, vu, l AS level, b AS trend, s AS season,
       |  l + b + sea[1] AS forecast
       |FROM walk
       |ORDER BY user_id, rn""".stripMargin
  }

  private def q118Ewma(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.TimeSeriesOps.ewma(Tables.events(spark, dir),
        "user_id", "ts", "event_id", "value")
      .orderBy($"user_id", $"rn")
  }

  private val q118Sql =
    """WITH RECURSIVE ord AS (
      |  SELECT user_id,
      |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vu,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |walk AS (
      |  SELECT user_id, rn, vu, vu AS s FROM ord WHERE rn = 1
      |  UNION ALL
      |  SELECT o.user_id, o.rn, o.vu, (7 * w.s + o.vu) // 8
      |  FROM walk w JOIN ord o ON o.user_id = w.user_id AND o.rn = w.rn + 1)
      |SELECT user_id, rn, vu, s AS ewma
      |FROM walk
      |ORDER BY user_id, rn""".stripMargin

  /** CUSUM changepoint monitoring (north star): Page's two-sided
    * cumulative-sum chart over each user's value stream in pure integer
    * arithmetic (TimeSeriesOps.cusum — the q118 sorted-fold shape with
    * restart-on-alarm state). Oracle: the same recurrence as a
    * recursive-CTE walk; accumulators AND alarm booleans under the
    * hash. */
  private def q122Cusum(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.TimeSeriesOps.cusum(Tables.events(spark, dir),
        "user_id", "ts", "event_id", "value",
        refUnits = 60000L, hUnits = 300000L)
      .orderBy($"user_id", $"rn")
  }

  private val q122Sql =
    """WITH RECURSIVE ord AS (
      |  SELECT user_id,
      |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vu,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |walk AS (
      |  SELECT user_id, rn, vu,
      |    CASE WHEN greatest(0, vu - 60000) > 300000 THEN 0
      |         ELSE greatest(0, vu - 60000) END AS cpos,
      |    CASE WHEN greatest(0, 60000 - vu) > 300000 THEN 0
      |         ELSE greatest(0, 60000 - vu) END AS cneg,
      |    (greatest(0, vu - 60000) > 300000
      |      OR greatest(0, 60000 - vu) > 300000) AS alarm
      |  FROM ord WHERE rn = 1
      |  UNION ALL
      |  SELECT o.user_id, o.rn, o.vu,
      |    CASE WHEN greatest(0, w.cpos + o.vu - 60000) > 300000 THEN 0
      |         ELSE greatest(0, w.cpos + o.vu - 60000) END,
      |    CASE WHEN greatest(0, w.cneg + 60000 - o.vu) > 300000 THEN 0
      |         ELSE greatest(0, w.cneg + 60000 - o.vu) END,
      |    (greatest(0, w.cpos + o.vu - 60000) > 300000
      |      OR greatest(0, w.cneg + 60000 - o.vu) > 300000)
      |  FROM walk w JOIN ord o ON o.user_id = w.user_id AND o.rn = w.rn + 1)
      |SELECT user_id, rn, vu, cpos, cneg, alarm
      |FROM walk
      |ORDER BY user_id, rn""".stripMargin

  /** Clickstream path mining (north star): the most common 3-step
    * event-type sequences across users — ONE window pass (two leads over
    * the shared (user, ts, id) sort) + one aggregate; the top-20 cut has
    * a path tiebreak so boundary ties are deterministic in both
    * engines. The sequence-analytics sibling of q33's lead/lag and
    * q98's funnel. */
  private def q120PathTrigrams(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("e2", lead($"event_type", 1).over(w))
      .withColumn("e3", lead($"event_type", 2).over(w))
      .filter($"e2".isNotNull && $"e3".isNotNull)
      .select($"user_id", concat_ws(">", $"event_type", $"e2", $"e3").as("path"))
      .groupBy($"path")
      .agg(count(lit(1)).as("n"), countDistinct($"user_id").as("n_users"))
      .orderBy($"n".desc, $"path")
      .limit(20)
  }

  private val q120Sql =
    """WITH s AS (
      |  SELECT user_id, event_type,
      |    lead(event_type, 1) OVER w AS e2,
      |    lead(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_type || '>' || e2 || '>' || e3 AS path,
      |  COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
      |FROM s
      |WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      |GROUP BY 1
      |ORDER BY n DESC, path
      |LIMIT 20""".stripMargin

  /** Hourly gap-filled resample per user, last-observation-carried-forward
    * (operators/Resample — the InfluxDB `GROUP BY time(1h) fill(previous)` /
    * TimescaleDB `time_bucket_gapfill + locf` surface). The oracle replays
    * the whole pipeline relationally: deterministic last-wins in-cell
    * reduction, per-key generate_series grid, LEFT JOIN, IGNORE-NULLS
    * running fill. Values pass through untouched (no float arithmetic), so
    * the driver hash pins fill placement exactly. */
  private def q126ResampleLocf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.Resample.resample(Tables.events(spark, dir),
        keyCol = "user_id", tsCol = "ts", valueCol = "value",
        tieCol = "event_id", stepUs = 3600000000L, fill = "locf")
      .select($"user_id", $"bucket",
        date_format($"bucket_ts", "yyyy-MM-dd HH:mm:ss").as("bucket_ts"),
        $"value", $"n_obs", $"observed")
      .orderBy($"user_id", $"bucket")
  }

  private val q126Sql =
    """WITH b AS (
      |  SELECT user_id, epoch_us(ts) // 3600000000 AS bucket, value,
      |    row_number() OVER (PARTITION BY user_id, epoch_us(ts) // 3600000000
      |                       ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |  FROM events),
      |pc AS (
      |  SELECT user_id, bucket,
      |    MAX(CASE WHEN rn = 1 THEN value END) AS cell_value,
      |    COUNT(*) AS n_obs
      |  FROM b GROUP BY 1, 2),
      |span AS (SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM pc GROUP BY 1),
      |grid AS (SELECT user_id, UNNEST(generate_series(b0, b1)) AS bucket FROM span),
      |j AS (
      |  SELECT g.user_id, g.bucket, pc.cell_value, COALESCE(pc.n_obs, 0) AS n_obs
      |  FROM grid g LEFT JOIN pc ON pc.user_id = g.user_id AND pc.bucket = g.bucket)
      |SELECT user_id, bucket,
      |  strftime(make_timestamp(bucket * 3600000000), '%Y-%m-%d %H:%M:%S') AS bucket_ts,
      |  last_value(cell_value IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
      |  n_obs, cell_value IS NOT NULL AS observed
      |FROM j
      |ORDER BY user_id, bucket""".stripMargin

  /** Linear-interpolation variant of q126 (TimescaleDB `interpolate()`):
    * gap cells take pv + (nv−pv)·(Δb/span) between the straddling observed
    * cells; trailing gaps fall back to LOCF (no right bound). The lerp is
    * the SAME IEEE double expression in both engines over identical
    * inputs, so even the interpolated values hash-match exactly. */
  private def q127ResampleLerp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.Resample.resample(Tables.events(spark, dir),
        keyCol = "user_id", tsCol = "ts", valueCol = "value",
        tieCol = "event_id", stepUs = 3600000000L, fill = "linear")
      .select($"user_id", $"bucket", $"value", $"n_obs", $"observed")
      .orderBy($"user_id", $"bucket")
  }

  private val q127Sql =
    """WITH b AS (
      |  SELECT user_id, epoch_us(ts) // 3600000000 AS bucket, value,
      |    row_number() OVER (PARTITION BY user_id, epoch_us(ts) // 3600000000
      |                       ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |  FROM events),
      |pc AS (
      |  SELECT user_id, bucket,
      |    MAX(CASE WHEN rn = 1 THEN value END) AS cell_value,
      |    COUNT(*) AS n_obs
      |  FROM b GROUP BY 1, 2),
      |span AS (SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM pc GROUP BY 1),
      |grid AS (SELECT user_id, UNNEST(generate_series(b0, b1)) AS bucket FROM span),
      |j AS (
      |  SELECT g.user_id, g.bucket, pc.cell_value, COALESCE(pc.n_obs, 0) AS n_obs
      |  FROM grid g LEFT JOIN pc ON pc.user_id = g.user_id AND pc.bucket = g.bucket),
      |w AS (
      |  SELECT user_id, bucket, cell_value, n_obs,
      |    last_value(CASE WHEN cell_value IS NOT NULL THEN bucket END IGNORE NULLS)
      |      OVER pw AS pb,
      |    last_value(cell_value IGNORE NULLS) OVER pw AS pv,
      |    first_value(CASE WHEN cell_value IS NOT NULL THEN bucket END IGNORE NULLS)
      |      OVER nw AS nb,
      |    first_value(cell_value IGNORE NULLS) OVER nw AS nv
      |  FROM j
      |  WINDOW
      |    pw AS (PARTITION BY user_id ORDER BY bucket
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    nw AS (PARTITION BY user_id ORDER BY bucket
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT user_id, bucket,
      |  CASE WHEN cell_value IS NOT NULL THEN cell_value
      |       WHEN nb IS NULL THEN pv
      |       ELSE pv + (nv - pv) * (CAST(bucket - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE))
      |  END AS value,
      |  n_obs, cell_value IS NOT NULL AS observed
      |FROM w
      |ORDER BY user_id, bucket""".stripMargin

  /** Daily volume-weighted average value per event type — the VWAP shape
    * (price=value, volume=the JSON `k` prop): exact decimal sums for both
    * numerator and denominator, ONE hash aggregate, then a single double
    * division that is bit-identical across engines. */
  private def q128Vwap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .filter($"k".isNotNull)
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"), $"event_type")
      .agg(
        dsumProduct($"value", $"k").as("pv_sum"),
        dsum($"k").as("volume"),
        count(lit(1)).as("n"))
      .withColumn("vwap", $"pv_sum" / $"volume")
      .select($"day", $"event_type", $"vwap", $"volume", $"n")
      .orderBy($"day", $"event_type")
  }

  private val q128Sql =
    """WITH e AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, value,
      |    CAST(json_extract_string(props, '$.k') AS INT) AS k
      |  FROM events
      |  WHERE json_extract_string(props, '$.k') IS NOT NULL)
      |SELECT day, event_type,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(k AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(SUM(CAST(k AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS vwap,
      |  CAST(CAST(SUM(CAST(k AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS volume,
      |  COUNT(*) AS n
      |FROM e
      |GROUP BY day, event_type
      |ORDER BY day, event_type""".stripMargin

  /** Interarrival gap detection per user (monitoring: "this stream went
    * quiet") — one lag window over the (user, ts, id) sort, exact
    * microsecond arithmetic; gaps longer than 2 days emitted with both
    * endpoints. The data-integrity sibling of q106's anomaly flags. */
  private def q129Gaps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val gapUs = 2L * 86400 * 1000000
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    Tables.events(spark, dir)
      .withColumn("us", graft.operators.TimeSeriesOps.eventMicros($"ts"))
      .withColumn("prev_us", lag($"us", 1).over(w))
      .filter($"prev_us".isNotNull && $"us" - $"prev_us" > gapUs)
      .select($"user_id",
        date_format(timestamp_micros($"prev_us"), "yyyy-MM-dd HH:mm:ss").as("gap_start"),
        date_format(timestamp_micros($"us"), "yyyy-MM-dd HH:mm:ss").as("gap_end"),
        ($"us" - $"prev_us").as("gap_us"),
        $"event_id".as("end_event_id"))
      .orderBy($"user_id", $"end_event_id")
  }

  private val q129Sql =
    """WITH s AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |                            ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events)
      |SELECT user_id,
      |  strftime(make_timestamp(prev_us), '%Y-%m-%d %H:%M:%S') AS gap_start,
      |  strftime(make_timestamp(us), '%Y-%m-%d %H:%M:%S') AS gap_end,
      |  us - prev_us AS gap_us,
      |  event_id AS end_event_id
      |FROM s
      |WHERE prev_us IS NOT NULL AND us - prev_us > 172800000000
      |ORDER BY user_id, end_event_id""".stripMargin

  /** Rolling 7-day distinct active users per day (rolling WAU) — EXACT
    * windowed distinct counting, the metric `approx_count_distinct` over
    * sliding windows usually approximates. The bounded-fan-out rewrite:
    * distinct (day, user) pairs first (the only full-data pass), then
    * each pair contributes to the 7 report days it covers (a row-local
    * 7× explode of the ALREADY-distinct pairs), then one exact distinct
    * count per report day. Shuffle volume is pairs×7, independent of raw
    * event multiplicity — never a per-day self-join chain. */
  private def q136RollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Tables.events(spark, dir)
      .select(to_date($"ts").as("d"), $"user_id").distinct()
    // clamp to the last ACTIVE day: without it the 7× fan-out emits six
    // phantom report days past the data's end, whose shrinking counts
    // read as an end-of-period engagement crash
    val lastDay = pairs.agg(max($"d").as("__last"))
    pairs
      .withColumn("i", explode(sequence(lit(0), lit(6))))
      .join(broadcast(lastDay))
      .filter(date_add($"d", $"i") <= $"__last")
      .select(date_format(date_add($"d", $"i"), "yyyy-MM-dd").as("day"), $"user_id")
      .groupBy($"day")
      .agg(countDistinct($"user_id").as("active_7d"))
      .orderBy($"day")
  }

  private val q136Sql =
    """WITH pairs AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
      |x AS (
      |  SELECT d + CAST(i AS INTEGER) AS day, user_id
      |  FROM pairs, range(7) t(i)
      |  WHERE d + CAST(i AS INTEGER) <= (SELECT MAX(d) FROM pairs))
      |SELECT strftime(day, '%Y-%m-%d') AS day,
      |  COUNT(DISTINCT user_id) AS active_7d
      |FROM x
      |GROUP BY 1
      |ORDER BY day""".stripMargin

  /** Maximum drawdown per user (the quant risk metric: deepest
    * peak-to-trough fall of the value stream) in q118's fixed-point
    * thousandth units — running peak and drawdown are integer window
    * maxima over the (ts, event_id) total order, so the result is exact
    * and engine-portable. One shuffle on the series key; running state
    * is a single max. */
  private def q142Drawdown(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .withColumn("us", graft.operators.TimeSeriesOps.eventMicros($"ts"))
      .withColumn("vu", floor($"value" * 1000 + 0.5).cast("long"))
      .withColumn("peak", max($"vu").over(w))
      .groupBy($"user_id")
      .agg(
        max($"peak" - $"vu").as("max_drawdown_units"),
        max($"peak").as("peak_units"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  private val q142Sql =
    """WITH s AS (
      |  SELECT user_id,
      |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vu,
      |    MAX(CAST(floor(value * 1000 + 0.5) AS BIGINT)) OVER (
      |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      |  FROM events)
      |SELECT user_id,
      |  MAX(peak - vu) AS max_drawdown_units,
      |  MAX(peak) AS peak_units,
      |  COUNT(*) AS n_events
      |FROM s
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** Longest consecutive-day activity streak per user (gaps-and-islands
    * on the date axis — the engagement metric): distinct active days,
    * island key = day − row_number (constant exactly across a
    * consecutive run), longest island wins with earliest-start
    * tie-break. Everything is date arithmetic — exact in both
    * engines. */
  private def q143Streaks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byDay = Window.partitionBy($"user_id").orderBy($"d")
    val best = Window.partitionBy($"user_id").orderBy($"len".desc, $"start")
    Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("d")).distinct()
      .withColumn("grp", date_sub($"d", row_number().over(byDay)))
      .groupBy($"user_id", $"grp")
      .agg(count(lit(1)).as("len"), min($"d").as("start"), max($"d").as("end"))
      .withColumn("r", row_number().over(best))
      .filter($"r" === 1)
      .select($"user_id", $"len".as("streak_days"),
        date_format($"start", "yyyy-MM-dd").as("streak_start"),
        date_format($"end", "yyyy-MM-dd").as("streak_end"))
      .orderBy($"user_id")
  }

  private val q143Sql =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |isl AS (
      |  SELECT user_id, d,
      |    d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER) AS grp
      |  FROM days),
      |runs AS (
      |  SELECT user_id, grp, COUNT(*) AS len, MIN(d) AS start, MAX(d) AS "end"
      |  FROM isl GROUP BY user_id, grp),
      |best AS (
      |  SELECT user_id, len, start, "end",
      |    row_number() OVER (PARTITION BY user_id ORDER BY len DESC, start) AS r
      |  FROM runs)
      |SELECT user_id, len AS streak_days,
      |  strftime(start, '%Y-%m-%d') AS streak_start,
      |  strftime("end", '%Y-%m-%d') AS streak_end
      |FROM best WHERE r = 1
      |ORDER BY user_id""".stripMargin

  /** Daily time-weighted average value per user (TWAP — q128's VWAP
    * sibling weighted by holding time instead of volume): each
    * observation holds until the next one in the same (user, day), the
    * weighted sum Σ vu·Δt runs in fixed-point×µs integer terms summed
    * under DECIMAL(38,0)/HUGEINT (terms reach ~10¹⁶ — a long sum could
    * overflow, a double sum would round), and only the final
    * correctly-rounded division touches floats. Single-observation days
    * fall back to the observation itself. */
  private def q144Twap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy($"user_id", $"day").orderBy($"us", $"event_id")
    Tables.events(spark, dir)
      .withColumn("us", graft.operators.TimeSeriesOps.eventMicros($"ts"))
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
      .withColumn("vu", floor($"value" * 1000 + 0.5).cast("long"))
      .withColumn("seg", lead($"us", 1).over(w) - $"us")
      .groupBy($"user_id", $"day")
      .agg(
        sum(($"vu" * $"seg").cast(dec)).as("num"),
        sum($"seg").as("den"),
        max($"vu").as("only_vu"),
        count(lit(1)).as("n_events"))
      .select($"user_id", $"day",
        when($"den" > 0, $"num".cast("double") / $"den".cast("double"))
          .otherwise($"only_vu".cast("double")).as("twap_units"),
        $"n_events")
      .orderBy($"user_id", $"day")
  }

  private val q144Sql =
    """WITH s AS (
      |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_id,
      |    epoch_us(ts) AS us,
      |    CAST(floor(value * 1000 + 0.5) AS BIGINT) AS vu,
      |    lead(epoch_us(ts)) OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
      |                             ORDER BY epoch_us(ts), event_id) - epoch_us(ts) AS seg
      |  FROM events),
      |g AS (
      |  SELECT user_id, day,
      |    SUM(CAST(vu AS HUGEINT) * seg) AS num,
      |    SUM(seg) AS den,
      |    MAX(vu) AS only_vu,
      |    COUNT(*) AS n_events
      |  FROM s GROUP BY user_id, day)
      |SELECT user_id, day,
      |  CASE WHEN den > 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
      |       ELSE CAST(only_vu AS DOUBLE) END AS twap_units,
      |  n_events
      |FROM g
      |ORDER BY user_id, day""".stripMargin

  /** Largest-triangle downsampling (north star): one representative point
    * per 6-hour bucket per event type — the dashboard-rendering reduction
    * of an unboundedly large telemetry series. Engine:
    * [[graft.operators.Downsample.lttb]], the parallel bucket-mean LTTB
    * variant with the triangle area decided in EXACT integer arithmetic
    * (decimal(38,0) here, HUGEINT in the oracle) so the per-bucket argmax
    * replays bit-for-bit. The oracle replays the whole contract
    * relationally: same bucket sums, same lag/lead neighbor means, same
    * six-product area expansion, same branch-encoded sort. */
  private def q238Lttb(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.Downsample.lttb(
        Tables.events(spark, dir), "event_type", "ts", "value",
        bucketMillis = 21600000L)
      .orderBy($"event_type", $"bucket")
  }

  private val q238Sql =
    """WITH pts AS (
      |  SELECT event_type AS k, epoch_ms(ts) AS x,
      |    CAST(floor(value * 1000000.0) AS BIGINT) AS y,
      |    epoch_ms(ts) // 21600000 AS b
      |  FROM events),
      |s AS (
      |  SELECT k, b, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy
      |  FROM pts GROUP BY k, b),
      |nb AS (
      |  SELECT k, b, n,
      |    lag(n) OVER w AS pn, lag(sx) OVER w AS psx, lag(sy) OVER w AS psy,
      |    lead(n) OVER w AS nn, lead(sx) OVER w AS nsx, lead(sy) OVER w AS nsy
      |  FROM s WINDOW w AS (PARTITION BY k ORDER BY b)),
      |j AS (
      |  SELECT p.k, p.b, p.x, p.y, nb.n, nb.pn, nb.nn,
      |    abs(CAST(nb.psx AS HUGEINT) * nb.nn * p.y
      |      - CAST(nb.psx AS HUGEINT) * nb.nsy
      |      + CAST(p.x AS HUGEINT) * nb.pn * nb.nsy
      |      - CAST(p.x AS HUGEINT) * nb.nn * nb.psy
      |      + CAST(nb.nsx AS HUGEINT) * nb.psy
      |      - CAST(nb.nsx AS HUGEINT) * nb.pn * p.y) AS e
      |  FROM pts p JOIN nb ON p.k = nb.k AND p.b = nb.b),
      |r AS (
      |  SELECT k, b, x, y, n, row_number() OVER (
      |    PARTITION BY k, b ORDER BY
      |      (CASE WHEN pn IS NULL THEN CAST(x AS HUGEINT)
      |            WHEN nn IS NULL THEN -CAST(x AS HUGEINT)
      |            ELSE -e END) ASC,
      |      (CASE WHEN pn IS NULL THEN y WHEN nn IS NULL THEN -y
      |            ELSE x END) ASC,
      |      (CASE WHEN pn IS NULL OR nn IS NULL THEN 0 ELSE y END) ASC) AS rn
      |  FROM j)
      |SELECT k AS event_type, b AS bucket, x AS x_millis, y AS y_units,
      |  CAST(n AS BIGINT) AS n_points
      |FROM r WHERE rn = 1
      |ORDER BY event_type, bucket""".stripMargin

  /** Decayed trending leaderboard (north star): top-10 users per event
    * type by exponentially decayed daily activity — yesterday's burst
    * must not outrank today's. Engine:
    * [[graft.operators.Decayed.leaderboard]] — per-window counts times
    * EXACT power-of-two weights (integer units of 2^-18, explicit 18-day
    * cutoff instead of a float tail), one 1-row global-max broadcast,
    * per-key top-k under WindowGroupLimit. The oracle replays the whole
    * weighting relationally in BIGINT. */
  private def q240DecayedLeaders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.Decayed.leaderboard(
        Tables.events(spark, dir), "event_type", "user_id", "ts",
        windowMillis = 86400000L, maxBack = 18, k = 10)
      .select($"event_type", $"user_id", $"score_units",
        $"rank".cast("long").as("rank"))
      .orderBy($"event_type", $"rank")
  }

  private val q240Sql =
    """WITH pw AS (
      |  SELECT event_type AS k, user_id AS item,
      |    epoch_ms(ts) // 86400000 AS w, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2, 3),
      |mx AS (SELECT MAX(w) AS wmax FROM pw),
      |sc AS (
      |  SELECT k, item,
      |    SUM(c * CAST(power(2, 18 - (wmax - w)) AS BIGINT)) AS score_units
      |  FROM pw CROSS JOIN mx WHERE wmax - w <= 18 GROUP BY 1, 2),
      |r AS (
      |  SELECT k, item, score_units, row_number() OVER (
      |    PARTITION BY k ORDER BY score_units DESC, item ASC) AS rnk
      |  FROM sc)
      |SELECT k AS event_type, item AS user_id,
      |  CAST(score_units AS BIGINT) AS score_units,
      |  CAST(rnk AS BIGINT) AS rank
      |FROM r WHERE rnk <= 10
      |ORDER BY event_type, rank""".stripMargin

  /** M4 downsampling (north star): q238's error-free companion — per
    * bucket the first/last/min/max points (Jugel et al.'s pixel-exact
    * line-chart reduction; any other point cannot change a
    * 1-px-per-bucket rendering). ONE groupBy with map-side struct
    * min/max partials — no window, no join, the cheapest distributed
    * shape. The oracle re-derives the deterministic tie contract with
    * two-level MIN/MAX CASE aggregates. */
  private def q245M4(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.Downsample.m4(
        Tables.events(spark, dir), "event_type", "ts", "value",
        bucketMillis = 21600000L)
      .orderBy($"event_type", $"bucket")
  }

  private val q245Sql =
    """WITH pts AS (
      |  SELECT event_type AS k, epoch_ms(ts) AS x,
      |    CAST(floor(value * 1000000.0) AS BIGINT) AS y,
      |    epoch_ms(ts) // 21600000 AS b
      |  FROM events),
      |g AS (
      |  SELECT k, b, COUNT(*) AS n, MIN(x) AS fx, MAX(x) AS lx,
      |    MIN(y) AS miny, MAX(y) AS maxy
      |  FROM pts GROUP BY k, b)
      |SELECT g.k AS event_type, g.b AS bucket,
      |  g.fx AS x_first,
      |  CAST(MIN(CASE WHEN p.x = g.fx THEN p.y END) AS BIGINT) AS y_first,
      |  g.lx AS x_last,
      |  CAST(MAX(CASE WHEN p.x = g.lx THEN p.y END) AS BIGINT) AS y_last,
      |  CAST(MIN(CASE WHEN p.y = g.miny THEN p.x END) AS BIGINT) AS x_min,
      |  g.miny AS y_min,
      |  CAST(MAX(CASE WHEN p.y = g.maxy THEN p.x END) AS BIGINT) AS x_max,
      |  g.maxy AS y_max,
      |  CAST(g.n AS BIGINT) AS n_points
      |FROM pts p JOIN g ON p.k = g.k AND p.b = g.b
      |GROUP BY g.k, g.b, g.fx, g.lx, g.miny, g.maxy, g.n
      |ORDER BY event_type, bucket""".stripMargin

  override def queries: Seq[Q] = Seq(
    Q("q245_m4", q245M4, Some(q245Sql),
      "M4 pixel-exact downsampling: first/last/min/max per bucket, one aggregate (north star)"),
    Q("q240_decayed_leaders", q240DecayedLeaders, Some(q240Sql),
      "decayed trending leaderboard: exact power-of-two half-life weights, top-10 per key (north star)"),
    Q("q238_lttb", q238Lttb, Some(q238Sql),
      "largest-triangle (LTTB) downsampling: one point per bucket by exact integer area (north star)"),
    Q("q144_twap", q144Twap, Some(q144Sql),
      "daily time-weighted average per user: integer-exact Σ value·Δt / Σ Δt"),
    Q("q142_drawdown", q142Drawdown, Some(q142Sql),
      "max drawdown per user in fixed-point units (running integer peak)"),
    Q("q143_streaks", q143Streaks, Some(q143Sql),
      "longest consecutive-day activity streak via gaps-and-islands"),
    Q("q136_rolling_distinct", q136RollingDistinct, Some(q136Sql),
      "exact rolling 7-day distinct actives via bounded pair fan-out"),
    Q("q126_resample_locf", q126ResampleLocf, Some(q126Sql),
      "hourly gap-filled resample, last-observation-carried-forward (Resample op)"),
    Q("q127_resample_lerp", q127ResampleLerp, Some(q127Sql),
      "hourly resample with linear interpolation between observed cells"),
    Q("q128_vwap", q128Vwap, Some(q128Sql),
      "daily volume-weighted average value per event type (exact decimal sums)"),
    Q("q129_gaps", q129Gaps, Some(q129Sql),
      "interarrival gap detection per user (stream-went-quiet monitoring)"),
    Q("q204_holt_winters", q204HoltWinters, Some(q204Sql),
      "Holt-Winters triple smoothing: rotating seasonal lanes vs list-state recursive-CTE oracle (north star)"),
    Q("q202_holt", q202Holt, Some(q202Sql),
      "Holt level+trend smoothing with one-step forecast, fixed-point floor recurrence (north star)"),
    Q("q118_ewma", q118Ewma, Some(q118Sql),
      "fixed-point EWMA per user vs recursive-CTE oracle (north star)"),
    Q("q120_path_trigrams", q120PathTrigrams, Some(q120Sql),
      "top event-type 3-step paths: one window pass + aggregate (north star)"),
    Q("q122_cusum", q122Cusum, Some(q122Sql),
      "two-sided integer CUSUM changepoint chart vs recursive-CTE oracle (north star)"),
    Q("q11_ohlcv", q11Ohlcv, Some(q11Sql), "daily OHLCV candles, deterministic open/close (A6)"),
    Q("q73_interval_join", q73IntervalJoin, Some(q73Sql),
      "binned interval join: views within 6h before each click vs IEJoin oracle"),
    Q("q78_global_window", q78GlobalWindow, Some(q78Sql),
      "UNKEYED interval join: any-user clicks within 5min before each purchase vs IEJoin oracle"),
    Q("q33_lead_lag", q33LeadLag, Some(q33Sql), "offset window functions (lead/lag/delta)"),
    Q("q106_anomalies", q106Anomalies, Some(q106Sql),
      "rolling z-score anomaly flags in exact cross-multiplied integer arithmetic"),
    Q("q12_rolling_24h", q12Rolling24h, Some(q12Sql), "24h accumulated sums, event-time range frame (A4)"),
    Q("q13_rolling_extremes", q13RollingExtremes, Some(q13Sql), "rolling 7d high/low (A5)"),
    Q("q14_daily_buckets", q14DailyBuckets, Some(q14Sql), "daily tumbling buckets (T4/W2)"),
    Q("q15_json_extract", q15JsonExtract, Some(q15Sql), "JSON parse + cast + agg (F11/F13)"),
    Q("q16_date_functions", q16DateFunctions, Some(q16Sql), "date format/parse/arithmetic (F1-F3)"),
    Q("q17_event_dedup", q17EventDedup, Some(q17Sql), "keyed dedup keeping earliest (T2/A2)"))
}
