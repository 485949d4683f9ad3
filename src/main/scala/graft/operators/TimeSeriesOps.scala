package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series operators (SURVEY A4-A6, W1-W3): OHLCV candles, rolling
  * event-time aggregates, and incremental resume cursors.
  *
  * All are single-shuffle shapes: one hash partitioning on the series key,
  * sorts stay within partitions, rolling state is bounded by the frame. */
object TimeSeriesOps {

  /** Event time in epoch-microseconds, tolerant of TIMESTAMP_NTZ columns
    * (parquet `timestamp[us]` without the UTC-adjusted flag reads as NTZ;
    * `unix_micros` rejects NTZ outright). The cast is an identity no-op on
    * TimestampType and a lossless NTZ→instant conversion under the pinned
    * UTC session timezone (GraftSession). */
  def eventMicros(c: Column): Column =
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))

  /** Per-key, per-bucket OHLCV candles with deterministic open/close
    * (row_number over (ts, tieCol) — never `first`/`last`, which are
    * order-nondeterministic in aggregates; SURVEY §7.4 risk 2). */
  def ohlcv(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      tieCol: String, bucketFormat: String = "yyyy-MM-dd",
      volumeAgg: Column => Column = sum): DataFrame = {
    val bucketed = df.withColumn("bucket", date_format(col(tsCol), bucketFormat))
    val asc = Window.partitionBy(col(keyCol), col("bucket"))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val desc = Window.partitionBy(col(keyCol), col("bucket"))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    bucketed
      .withColumn("__rna", row_number().over(asc))
      .withColumn("__rnd", row_number().over(desc))
      .groupBy(col(keyCol), col("bucket"))
      .agg(
        max(when(col("__rna") === 1, col(valueCol))).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max(when(col("__rnd") === 1, col(valueCol))).as("close"),
        volumeAgg(col(valueCol)).as("volume"),
        count(lit(1)).as("n"))
  }

  /** Rolling event-time aggregate over the trailing `windowSec` seconds per
    * key (A4's acc_*_24h generalized). `aggs` maps output name -> aggregate
    * expression (e.g. `sum($"value")`), which is evaluated over the
    * trailing range frame. */
  def rolling(df: DataFrame, keyCol: String, tsCol: String, windowSec: Long)(
      aggs: (String, Column)*): DataFrame = {
    val frame = Window.partitionBy(col(keyCol)).orderBy(eventMicros(col(tsCol)))
      .rangeBetween(-windowSec * 1000000L, 0)
    aggs.foldLeft(df) { case (d, (name, aggExpr)) =>
      d.withColumn(name, aggExpr.over(frame))
    }
  }

  /** Trailing high/low with the timestamp each extreme occurred at (A5's
    * highest_52_week_price + highest_52_week_date pair) via max_by/min_by
    * over the range frame. */
  def rollingExtremes(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, windowSec: Long): DataFrame = {
    val us = eventMicros(col(tsCol))
    val frame = Window.partitionBy(col(keyCol)).orderBy(us)
      .rangeBetween(-windowSec * 1000000L, 0)
    df.withColumn("__us", us)
      .withColumn("rolling_high", max(col(valueCol)).over(frame))
      .withColumn("rolling_low", min(col(valueCol)).over(frame))
      .withColumn("rolling_high_ts", max_by(col(tsCol), struct(col(valueCol), us)).over(frame))
      .withColumn("rolling_low_ts", min_by(col(tsCol), struct(col(valueCol), us)).over(frame))
      .drop("__us")
  }

  /** Resume cursor (W1): the max stored event time per key — the engine's
    * set-oriented form of the reference's per-market `ORDER BY ts DESC
    * LIMIT 1` probe loop (upbit_daily_candels.py:184-201: one query per
    * market; here one hash aggregate for all keys). */
  def resumeCursors(stored: DataFrame, keyCol: String, tsCol: String): DataFrame =
    stored.groupBy(col(keyCol)).agg(max(col(tsCol)).as("resume_from"))

  /** Incremental filter: keep only rows strictly newer than each key's
    * stored cursor; keys never seen before pass through. The anti-join-free
    * shape: broadcast the (small) cursor table. */
  def newerThanCursor(incoming: DataFrame, cursors: DataFrame,
      keyCol: String, tsCol: String): DataFrame =
    incoming.join(broadcast(cursors), Seq(keyCol), "left")
      .filter(col("resume_from").isNull || col(tsCol) > col("resume_from"))
      .drop("resume_from")

  /** Rolling z-score anomaly flags — each point vs its key's trailing
    * window, decided in EXACT integer arithmetic: |x−μ| > z·σ is
    * cross-multiplied to (n·x − S)² > z²·(n·Q − S²) with S = Σx,
    * Q = Σx² over fixed-point units (value rounded to 4 dp × 10⁴, the
    * Exact-discipline cast), so no quotient, square root, or float mean
    * ever materializes — μ and σ as doubles would sit on rounding
    * boundaries (the q85 lesson), the cross-multiplied form is
    * bit-identical on any engine (the q104 fixed-point move applied to
    * second moments). Wide integers ride DECIMAL(38,0) here / HUGEINT
    * in the oracle: scale-0 products can't round, magnitudes are
    * data-bounded (units⁴·n³ must fit 38 digits — values to ~10⁶ at
    * day-scale windows are fine). Same single-shuffle range frame as
    * [[rolling]]; an n = 1 window has x = μ, never anomalous. */
  def rollingAnomalies(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, windowSec: Long, z: Int = 3): DataFrame = {
    require(z >= 1, s"z must be >= 1, got $z")
    import org.apache.spark.sql.types.DecimalType
    val frame = Window.partitionBy(col(keyCol)).orderBy(eventMicros(col(tsCol)))
      .rangeBetween(-windowSec * 1000000L, 0)
    val units = (col(valueCol).cast(DecimalType(18, 4)) * 10000)
      .cast(DecimalType(38, 0))
    val d = df.withColumn("__x", units)
    val s = sum(col("__x")).over(frame)
    val q = sum(col("__x") * col("__x")).over(frame)
    val n = count(lit(1)).over(frame).cast(DecimalType(38, 0))
    val lhs = n * col("__x") - s
    d.withColumn("win_n", count(lit(1)).over(frame))
      .withColumn("is_anomaly", lhs * lhs > lit(z.toLong * z) * (n * q - s * s))
      .drop("__x")
  }

  /** Fixed-point exponentially-weighted moving average per key — the
    * classic stream-smoothing recurrence made engine-portable: values
    * quantize to integer units (`floor(v·units + 0.5)`,
    * IEEE-deterministic), α = 1/den, and each step is
    * `s' = ((den−1)·s + v) floordiv den` — pure integer arithmetic, so
    * the whole series is bit-identical on any engine (a float EWMA
    * accumulates rounding differently per multiply order; the floor
    * recurrence has exactly one representation). Seed: s₁ = v₁.
    *
    * Scale shape — the [[Funnel.funnelTimes]] sorted-fold discipline:
    * ONE groupBy(key) shuffle, each key's events gather into a sorted
    * array and a single left-to-right HOF fold runs the recurrence
    * row-locally (the recurrence is inherently sequential — there is no
    * associative reformulation of floor division, so a window frame
    * can't express it). Per-key history is the partition unit; the fold
    * appends to its output array, so per-key cost is O(n²) array copy —
    * fine at per-entity event counts (thousands), the same bound the
    * funnel documents. Output: (key, rn, vu, ewma), rn 1-based in
    * (ts, tie) order. */
  def ewma(events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, valueUnits: Int = 1000, den: Int = 8): DataFrame = {
    require(den >= 2, s"den must be >= 2, got $den")
    require(valueUnits >= 1, s"valueUnits must be >= 1, got $valueUnits")
    def floorDiv(x: Column, w: Int): Column = IntervalJoin.floorDiv(x, w.toLong)
    val evs = events
      .select(col(keyCol).as("__k"),
        struct(eventMicros(col(tsCol)).as("t"), col(tieCol).as("tie"),
          floor(col(valueCol) * valueUnits + lit(0.5)).cast("long").as("vu"))
          .as("__ev"))
      .groupBy("__k")
      .agg(sort_array(collect_list(col("__ev"))).as("__evs"))
    val init = struct(lit(0L).as("s"),
      array().cast("array<struct<vu:bigint,ewma:bigint>>").as("out"))
    val folded = evs.withColumn("__acc",
      aggregate(col("__evs"), init, (st, ev) => {
        val s2 = when(size(st.getField("out")) === 0, ev.getField("vu"))
          .otherwise(floorDiv(st.getField("s") * (den - 1) + ev.getField("vu"), den))
        struct(s2.as("s"),
          concat(st.getField("out"),
            array(struct(ev.getField("vu").as("vu"), s2.as("ewma")))).as("out"))
      }))
    folded
      .select(col("__k"), posexplode(col("__acc").getField("out")).as(Seq("pos", "e")))
      .select(col("__k").as(keyCol), (col("pos") + 1).cast("long").as("rn"),
        col("e.vu").as("vu"), col("e.ewma").as("ewma"))
  }

  /** Holt double-exponential (level + trend) smoothing per key —
    * [[ewma]]'s big sibling for series with drift: an EWMA chases a
    * trending series with a permanent lag, Holt carries an explicit
    * trend term and forecasts one step ahead. Same fixed-point floor
    * discipline (α = 1/denA, β = 1/denB):
    *
    *   l_t = ⌊(vu_t + (denA−1)·(l_{t−1} + b_{t−1})) / denA⌋
    *   b_t = ⌊((l_t − l_{t−1}) + (denB−1)·b_{t−1}) / denB⌋
    *
    * seeded l_1 = vu_1, b_1 = 0 (the no-prior-trend convention,
    * documented rather than the x_2−x_1 alternative so single-event
    * keys are well-defined). Floor division has exactly one
    * representation, so every (level, trend, forecast = l + b) integer
    * is engine-portable; same one-shuffle sorted-fold shape and the
    * same per-key O(n²) array-append caveat as [[ewma]]. */
  def holt(events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, valueUnits: Int = 1000, denA: Int = 8,
      denB: Int = 16): DataFrame = {
    require(denA >= 2 && denB >= 2, s"denominators must be >= 2, got $denA/$denB")
    require(valueUnits >= 1, s"valueUnits must be >= 1, got $valueUnits")
    def floorDiv(x: Column, w: Int): Column = IntervalJoin.floorDiv(x, w.toLong)
    val evs = events
      .select(col(keyCol).as("__k"),
        struct(eventMicros(col(tsCol)).as("t"), col(tieCol).as("tie"),
          floor(col(valueCol) * valueUnits + lit(0.5)).cast("long").as("vu"))
          .as("__ev"))
      .groupBy("__k")
      .agg(sort_array(collect_list(col("__ev"))).as("__evs"))
    val init = struct(lit(0L).as("l"), lit(0L).as("b"),
      array().cast("array<struct<vu:bigint,level:bigint,trend:bigint>>").as("out"))
    val folded = evs.withColumn("__acc",
      aggregate(col("__evs"), init, (st, ev) => {
        val first = size(st.getField("out")) === 0
        val l2 = when(first, ev.getField("vu"))
          .otherwise(floorDiv(ev.getField("vu") +
            (st.getField("l") + st.getField("b")) * (denA - 1), denA))
        val b2 = when(first, lit(0L))
          .otherwise(floorDiv((l2 - st.getField("l")) +
            st.getField("b") * (denB - 1), denB))
        struct(l2.as("l"), b2.as("b"),
          concat(st.getField("out"),
            array(struct(ev.getField("vu").as("vu"), l2.as("level"),
              b2.as("trend")))).as("out"))
      }))
    folded
      .select(col("__k"), posexplode(col("__acc").getField("out")).as(Seq("pos", "e")))
      .select(col("__k").as(keyCol), (col("pos") + 1).cast("long").as("rn"),
        col("e.vu").as("vu"), col("e.level").as("level"),
        col("e.trend").as("trend"),
        (col("e.level") + col("e.trend")).as("forecast"))
  }

  /** Holt–Winters additive triple smoothing per key — [[holt]] plus a
    * rotating seasonal lane vector of `period` integers (α = 1/denA,
    * β = 1/denB, γ = 1/denC, floor arithmetic throughout):
    *
    *   s⁻ = season head (the lane last updated a full period ago)
    *   l_t = ⌊((vu_t − s⁻) + (denA−1)(l+b)) / denA⌋
    *   b_t = ⌊((l_t − l_{t−1}) + (denB−1) b) / denB⌋
    *   s_t = ⌊((vu_t − l_t) + (denC−1) s⁻) / denC⌋
    *   season' = rotate(season) ++ [s_t]
    *
    * Seeding convention (documented, replayed by the oracle): the first
    * event sets l = vu, b = 0; the seasonal vector starts at zeros, so
    * the model degenerates to [[holt]] through the first period and
    * learns seasonality from the second onward — no look-ahead seeding,
    * so single-period keys stay well-defined. Forecast = l + b + the
    * NEXT lane (the rotated head). State per key is period + 2 longs;
    * same one-shuffle sorted-fold shape as its siblings. */
  def holtWinters(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, period: Int,
      valueUnits: Int = 1000, denA: Int = 8, denB: Int = 16,
      denC: Int = 8): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    require(denA >= 2 && denB >= 2 && denC >= 2,
      s"denominators must be >= 2, got $denA/$denB/$denC")
    require(valueUnits >= 1, s"valueUnits must be >= 1, got $valueUnits")
    def floorDiv(x: Column, w: Int): Column = IntervalJoin.floorDiv(x, w.toLong)
    val evs = events
      .select(col(keyCol).as("__k"),
        struct(eventMicros(col(tsCol)).as("t"), col(tieCol).as("tie"),
          floor(col(valueCol) * valueUnits + lit(0.5)).cast("long").as("vu"))
          .as("__ev"))
      .groupBy("__k")
      .agg(sort_array(collect_list(col("__ev"))).as("__evs"))
    val zeros = array_repeat(lit(0L), period)
    val init = struct(lit(0L).as("l"), lit(0L).as("b"), zeros.as("sea"),
      array().cast(
        "array<struct<vu:bigint,level:bigint,trend:bigint,season:bigint,forecast:bigint>>")
        .as("out"))
    val folded = evs.withColumn("__acc",
      aggregate(col("__evs"), init, (st, ev) => {
        val first = size(st.getField("out")) === 0
        val sPrev = element_at(st.getField("sea"), 1)
        val l2 = when(first, ev.getField("vu"))
          .otherwise(floorDiv((ev.getField("vu") - sPrev) +
            (st.getField("l") + st.getField("b")) * (denA - 1), denA))
        val b2 = when(first, lit(0L))
          .otherwise(floorDiv((l2 - st.getField("l")) +
            st.getField("b") * (denB - 1), denB))
        val s2 = when(first, lit(0L))
          .otherwise(floorDiv((ev.getField("vu") - l2) +
            sPrev * (denC - 1), denC))
        val rotated = concat(slice(st.getField("sea"), 2, period - 1),
          array(s2))
        struct(l2.as("l"), b2.as("b"), rotated.as("sea"),
          concat(st.getField("out"), array(struct(
            ev.getField("vu").as("vu"), l2.as("level"), b2.as("trend"),
            s2.as("season"),
            (l2 + b2 + element_at(rotated, 1)).as("forecast")))).as("out"))
      }))
    folded
      .select(col("__k"), posexplode(col("__acc").getField("out")).as(Seq("pos", "e")))
      .select(col("__k").as(keyCol), (col("pos") + 1).cast("long").as("rn"),
        col("e.vu").as("vu"), col("e.level").as("level"),
        col("e.trend").as("trend"), col("e.season").as("season"),
        col("e.forecast").as("forecast"))
  }

  /** Two-sided CUSUM changepoint detection per key — Page's cumulative-sum
    * control chart in pure integer arithmetic: with values in integer
    * units, `sp' = max(0, sp + vu − ref)` accumulates upward drift,
    * `sn' = max(0, sn + ref − vu)` downward; a side exceeding `h` raises
    * an alarm and RESETS to zero (the restart form, so repeated shifts
    * keep alarming). Like [[ewma]], the recurrence is sequential by
    * construction (max-with-zero kills associativity), so it runs as the
    * same single-shuffle sorted fold; every quantity is an exact integer
    * and the alarm decision is a comparison — bit-identical on any
    * engine. Output: (key, rn, vu, cpos, cneg, alarm), rn 1-based in
    * (ts, tie) order, cpos/cneg the POST-reset accumulators. */
  def cusum(events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, refUnits: Long, hUnits: Long,
      valueUnits: Int = 1000): DataFrame = {
    require(hUnits > 0, s"hUnits must be > 0, got $hUnits")
    require(valueUnits >= 1, s"valueUnits must be >= 1, got $valueUnits")
    val evs = events
      .select(col(keyCol).as("__k"),
        struct(eventMicros(col(tsCol)).as("t"), col(tieCol).as("tie"),
          floor(col(valueCol) * valueUnits + lit(0.5)).cast("long").as("vu"))
          .as("__ev"))
      .groupBy("__k")
      .agg(sort_array(collect_list(col("__ev"))).as("__evs"))
    val init = struct(lit(0L).as("sp"), lit(0L).as("sn"),
      array().cast("array<struct<vu:bigint,cpos:bigint,cneg:bigint,alarm:boolean>>")
        .as("out"))
    val folded = evs.withColumn("__acc",
      aggregate(col("__evs"), init, (st, ev) => {
        val spRaw = greatest(lit(0L), st.getField("sp") + ev.getField("vu") - refUnits)
        val snRaw = greatest(lit(0L), st.getField("sn") + lit(refUnits) - ev.getField("vu"))
        val alarm = spRaw > hUnits || snRaw > hUnits
        val sp2 = when(spRaw > hUnits, lit(0L)).otherwise(spRaw)
        val sn2 = when(snRaw > hUnits, lit(0L)).otherwise(snRaw)
        struct(sp2.as("sp"), sn2.as("sn"),
          concat(st.getField("out"),
            array(struct(ev.getField("vu").as("vu"), sp2.as("cpos"),
              sn2.as("cneg"), alarm.as("alarm")))).as("out"))
      }))
    folded
      .select(col("__k"), posexplode(col("__acc").getField("out")).as(Seq("pos", "e")))
      .select(col("__k").as(keyCol), (col("pos") + 1).cast("long").as("rn"),
        col("e.vu").as("vu"), col("e.cpos").as("cpos"),
        col("e.cneg").as("cneg"), col("e.alarm").as("alarm"))
  }
}
