package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Fixed-step resampling with gap filling — the "downsample to a regular
  * grid" operator every time-series store exposes (InfluxDB `GROUP BY
  * time(1h) fill(previous)`, TimescaleDB `time_bucket_gapfill` +
  * `locf()`), re-expressed as declarative Spark plans.
  *
  * Semantics: per key, the event time axis is bucketed into `stepUs`-wide
  * cells; each key gets a DENSE grid row for every cell between its first
  * and last observation, and empty cells are filled from the most recent
  * observed cell (last-observation-carried-forward) or linearly
  * interpolated between the straddling observations.
  *
  * Scale shape (the part that must survive 100 TB):
  *  - the per-(key, bucket) "last observation wins" reduction happens
  *    FIRST, so everything after the first shuffle is grid-sized (keys ×
  *    buckets-in-span), independent of raw event volume;
  *  - the grid explode is `sequence()` over each key's own [min, max]
  *    bucket span — row-local, no cross join against a global calendar
  *    (a global calendar × keys cross join is the classic gap-fill
  *    scale-killer: it materializes cells for key lifetimes that never
  *    overlapped);
  *  - the fill is one window pass per key ordered by bucket — state is a
  *    single row (LOCF) or two (interpolation bounds), never the
  *    partition.
  *
  * Exchanges: one hash partitioning by (key, bucket) for the reduction,
  * one by key for span + fill (the grid join keys by (key, bucket) but
  * AQE plans it off the same tiny grid frame). Everything crossing the
  * wire is (key, bucket: long, value: double) — never raw events.
  *
  * Guard: `sequence()` materializes a key's whole span in one row buffer,
  * so a key spanning years at second resolution would explode; callers
  * pick `stepUs` so span/step stays in the thousands (the operator fails
  * loudly past [[maxCellsPerKey]] rather than OOM-ing an executor).
  */
object Resample {

  /** Spark's `sequence()` cap is 2^31-1 elements but a span that large is
    * always a caller bug (wrong step unit); fail at a sane bound. */
  val maxCellsPerKey: Long = 10_000_000L

  /** Per-key fixed-step grid between each key's first and last observed
    * bucket. Output columns: key, `bucket` (epoch-micros / stepUs),
    * `bucket_ts` (bucket start as timestamp), `value` (filled),
    * `n_obs` (observations folded into the cell, 0 for gap cells),
    * `observed` (false for gap cells).
    *
    * In-cell reduction is "last observation wins", deterministically:
    * the cell's value is the observation with the greatest (ts, tieCol)
    * — `first`/`last` aggregates are order-nondeterministic (SURVEY §7.4
    * risk 2), row_number over an explicit total order is not.
    *
    * @param fill `"locf"` (carry the previous cell's value forward; cells
    *   before a key's first observation cannot exist by construction) or
    *   `"linear"` (linearly interpolate between the previous and next
    *   observed cells on the bucket axis; trailing gaps fall back to LOCF
    *   because there is no right bound — matching TimescaleDB
    *   `interpolate()` semantics).
    */
  def resample(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      tieCol: String, stepUs: Long, fill: String = "locf"): DataFrame = {
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    require(fill == "locf" || fill == "linear", s"unknown fill mode: $fill")
    val key = col(keyCol)

    // ---- in-cell reduction: one shuffle on (key, bucket), exchanges carry
    // (key, bucket, us, tie, value) — the raw event row never moves again.
    // Bucket via FLOOR division (IntervalJoin.floorDiv): double division
    // sits within an ulp of cell boundaries at epoch-micros magnitude, and
    // Spark's `div` truncates toward zero, misaligning pre-1970 cells
    // (DuckDB's `//` floors, so the oracle would disagree too).
    val bucketed = df
      .select(
        key,
        TimeSeriesOps.eventMicros(col(tsCol)).as("__us"),
        col(tieCol).as("__tie"),
        col(valueCol).as("__v"))
      .withColumn("bucket", IntervalJoin.floorDiv(col("__us"), stepUs))
    val lastWins = Window.partitionBy(key, col("bucket"))
      .orderBy(col("__us").desc, col("__tie").desc)
    val perCell = bucketed
      .withColumn("__rn", row_number().over(lastWins))
      .groupBy(key, col("bucket"))
      .agg(
        max(when(col("__rn") === 1, col("__v"))).as("cell_value"),
        count(lit(1)).as("n_obs"))

    // ---- dense grid: each key's own span only. perCell is grid-sized
    // already, so the span agg and the explode are cheap by construction.
    val span = perCell.groupBy(key)
      .agg(min(col("bucket")).as("__b0"), max(col("bucket")).as("__b1"))
      .withColumn("__cells", col("__b1") - col("__b0") + lit(1L))
    // assert_true is folded into sequence()'s END bound so it evaluates
    // BEFORE the span materializes (a guard in a separate projected-away
    // column would be pruned by Catalyst and never fire).
    val guard = assert_true(col("__cells") <= maxCellsPerKey,
      concat(lit(s"Resample: key span exceeds $maxCellsPerKey cells at stepUs=$stepUs: "),
        col("__cells").cast("string")))
    val grid = span.select(key,
      explode(sequence(col("__b0"),
        col("__b1") + coalesce(guard.cast("long"), lit(0L)))).as("bucket"))

    val joined = grid.join(perCell, Seq(keyCol, "bucket"), "left")

    // ---- fill: one window pass per key; LOCF state is one row.
    val byBucket = Window.partitionBy(key).orderBy(col("bucket"))
    val filled = fill match {
      case "locf" =>
        joined.withColumn("value",
          last(col("cell_value"), ignoreNulls = true)
            .over(byBucket.rowsBetween(Window.unboundedPreceding, 0)))
      case "linear" =>
        // bounds: previous/next OBSERVED (bucket, value) on each side.
        val prevW = byBucket.rowsBetween(Window.unboundedPreceding, 0)
        val nextW = byBucket.rowsBetween(0, Window.unboundedFollowing)
        val obsBucket = when(col("cell_value").isNotNull, col("bucket"))
        joined
          .withColumn("__pb", last(obsBucket, ignoreNulls = true).over(prevW))
          .withColumn("__pv", last(col("cell_value"), ignoreNulls = true).over(prevW))
          .withColumn("__nb", first(obsBucket, ignoreNulls = true).over(nextW))
          .withColumn("__nv", first(col("cell_value"), ignoreNulls = true).over(nextW))
          .withColumn("value",
            when(col("cell_value").isNotNull, col("cell_value"))
              .when(col("__nb").isNull, col("__pv")) // trailing gap → LOCF
              .otherwise(col("__pv") +
                (col("__nv") - col("__pv")) *
                  ((col("bucket") - col("__pb")).cast("double") /
                   (col("__nb") - col("__pb")).cast("double"))))
    }

    filled.select(
      key, col("bucket"),
      timestamp_micros(col("bucket") * stepUs).as("bucket_ts"),
      col("value"),
      coalesce(col("n_obs"), lit(0L)).as("n_obs"),
      col("cell_value").isNotNull.as("observed"))
  }
}
