package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Visual time-series downsampling: one representative point per fixed
  * time bucket per key, chosen by the largest-triangle criterion
  * (Steinarsson's LTTB family — the standard dashboard downsampler).
  *
  * This is the PARALLEL bucket-mean variant: classic LTTB anchors each
  * bucket's triangle on the point SELECTED in the previous bucket, a
  * sequential dependence that cannot distribute. Anchoring both sides on
  * the neighbor buckets' MEAN points instead (Steinarsson §4.2 discusses
  * exactly this relaxation; the fixed-anchor form is his LTOB/LTTB
  * middle ground) makes every bucket's argmax independent — two narrow
  * aggregates and one windowed join, no sequential state, no driver
  * loop. Visual fidelity is near-identical in practice because bucket
  * means are what the skipped points collapse to on screen anyway.
  *
  * Determinism/portability: the triangle area is evaluated in EXACT
  * integer arithmetic. With x = epoch millis (long), y = floor(value·10^6)
  * (long), and per-bucket sums (n, Σx, Σy), the area against the two
  * neighbor means, scaled by the positive constant n_L·n_R (argmax
  * invariant), expands to
  *
  *   E = | Σx_L·n_R·y_b − Σx_L·Σy_R + x_b·n_L·Σy_R
  *       − x_b·n_R·Σy_L + Σx_R·Σy_L − Σx_R·n_L·y_b |
  *
  * — six three-factor integer products. Magnitude budget: |x| < 2^41
  * (epoch millis), |y| ≤ 2^40, bucket count ≤ 2^21 keeps every sum in a
  * long and every product under 10^33 < 10^38, exact in Spark
  * decimal(38,0) and DuckDB HUGEINT alike — no float ever decides a
  * selection, so the result replays bit-for-bit in the oracle.
  *
  * Edge contract: a bucket with no left neighbor (the key's first)
  * yields its EARLIEST point, no right neighbor (the last) its LATEST —
  * LTTB's keep-the-endpoints rule, bucket-local. A single-bucket key
  * takes the first-bucket rule. Neighbors are the previous/next
  * NON-EMPTY buckets (gaps skip, matching lag/lead over the summary).
  * Ties on area break on (x asc, y asc) — fully deterministic.
  *
  * Rounding convention: micros→millis and millis→bucket are both FLOOR
  * division in exact integer arithmetic (`x - pmod(x,w)` makes the
  * dividend an exact multiple, so integral DIV equals mathematical
  * floor for any sign) — the one convention shared by this operator,
  * the streaming twin ([[graft.streaming.StreamingDownsample]] uses
  * `Timestamp.getTime`/`Math.floorDiv`, floor by construction) and the
  * DuckDB oracle, so the three agree bit-for-bit on negative epochs
  * too, not just post-1970 data. Oracle caveat: DuckDB's `//` truncates
  * toward zero on NEGATIVE numerators, so an oracle over signed epochs
  * must subtract the positive modulus first —
  * `((n) - (((n) % w) + w) % w) // w` — the repo's standard floor
  * mirror; `epoch_ms(ts) // w` alone is only correct for epochs ≥ 0
  * (true of all the driver test data).
  *
  * Scale shape: one groupBy(key, bucket) aggregate (map-side partial),
  * one key-partitioned window over the SUMMARY frame (bucket-count
  * sized, not point-sized), one shuffle-on-(key,bucket) join back to the
  * points, one per-bucket window for the argmax. Raw points shuffle
  * once; everything else moves (key, bucket)-sized summaries. At 100 TB
  * the output is ~n_keys·n_buckets rows — the whole point. */
object Downsample {

  /** Exact integer floor division `floor(x / w)` for `w > 0`: subtracting
    * the non-negative `pmod` remainder makes the dividend an exact
    * multiple of `w`, so the (truncating) integral DIV equals the
    * mathematical floor for any sign of `x` — no double ever touches the
    * value, so it stays exact past 2^52 too. */
  private def floorDivL(x: Column, w: Long): Column =
    call_function("div", x - pmod(x, lit(w)), lit(w))

  /** Internal working names plus each operator's output names; a key /
    * ts / value column reusing one would silently shadow or duplicate. */
  private val internalCols = Seq("__k", "__x", "__y", "__b")

  private def guardCols(op: String, keyCol: String, tsCol: String,
      valCol: String, outCols: Seq[String]): Unit = {
    val ins = Seq(keyCol, tsCol, valCol)
    require(ins.forall(c => !internalCols.contains(c)),
      s"$op: input column names may not use reserved internals $internalCols")
    require(!outCols.contains(keyCol),
      s"$op: keyCol '$keyCol' collides with output columns $outCols")
  }

  /** One row per (key, bucket): the selected point (`x_millis`,
    * `y_units`) plus the bucket's population `n_points`.
    *
    * @param bucketMillis fixed bucket width in milliseconds
    * @param quantScale   y quantization: y = floor(value · 10^quantScale) */
  def lttb(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      bucketMillis: Long, quantScale: Int = 6): DataFrame = {
    require(bucketMillis > 0, s"bucketMillis must be positive, got $bucketMillis")
    require(quantScale >= 0 && quantScale <= 9,
      s"quantScale must be in [0, 9], got $quantScale")
    guardCols("lttb", keyCol, tsCol, valCol,
      Seq("bucket", "x_millis", "y_units", "n_points"))

    val k = col(keyCol)
    val pts = df.select(
        k.as("__k"),
        floorDivL(unix_micros(col(tsCol)), 1000L).as("__x"),
        floor(col(valCol) * pow(lit(10.0), lit(quantScale))).cast("long")
          .as("__y"))
      .withColumn("__b", floorDivL(col("__x"), bucketMillis))

    val sums = pts.groupBy(col("__k"), col("__b"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__b"))
    val nb = sums.select(col("__k"), col("__b"), col("__n"),
      lag(col("__n"), 1).over(w).as("__pn"),
      lag(col("__sx"), 1).over(w).as("__psx"),
      lag(col("__sy"), 1).over(w).as("__psy"),
      lead(col("__n"), 1).over(w).as("__nn"),
      lead(col("__sx"), 1).over(w).as("__nsx"),
      lead(col("__sy"), 1).over(w).as("__nsy"))

    def d(c: Column): Column = c.cast(DecimalType(38, 0))
    val j = pts.join(nb, Seq("__k", "__b"))
    val e = abs(
      d(col("__psx")) * d(col("__nn")) * d(col("__y")) -
        d(col("__psx")) * d(col("__nsy")) +
        d(col("__x")) * d(col("__pn")) * d(col("__nsy")) -
        d(col("__x")) * d(col("__nn")) * d(col("__psy")) +
        d(col("__nsx")) * d(col("__psy")) -
        d(col("__nsx")) * d(col("__pn")) * d(col("__y")))
    val prevNull = col("__pn").isNull
    val nextNull = col("__nn").isNull
    // branch-encoded sort keys: first bucket → earliest point, last →
    // latest, interior → largest exact area, ties on (x, y) ascending
    val s1 = when(prevNull, d(col("__x")))
      .when(nextNull, -d(col("__x"))).otherwise(-e)
    val s2 = when(prevNull, col("__y"))
      .when(nextNull, -col("__y")).otherwise(col("__x"))
    val s3 = when(prevNull || nextNull, lit(0L)).otherwise(col("__y"))
    val wb = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(s1.asc, s2.asc, s3.asc)
    j.withColumn("__rn", row_number().over(wb))
      .filter(col("__rn") === 1)
      .select(col("__k").as(keyCol), col("__b").as("bucket"),
        col("__x").as("x_millis"), col("__y").as("y_units"),
        col("__n").as("n_points"))
  }

  /** M4 downsampling (Jugel et al., VLDB 2014): per (key, bucket) the
    * FOUR pixel-exact extreme points — first, last, min, max — the
    * error-free rasterization reduction for line charts (any point
    * between the four cannot change a 1-px-per-bucket rendering). Wide
    * output, one row per bucket; callers needing point rows unpivot.
    *
    * Unlike [[lttb]] this needs no neighbor context: ONE groupBy with
    * map-side partial min/max aggregates, no window, no join — the
    * cheapest possible distributed shape. Tie contract (deterministic,
    * oracle-replayable without min_by's unspecified ties): first =
    * lexicographic min of (x, y); last = lexicographic max of (x, y);
    * min = lexicographic min of (y, x); max = lexicographic max of
    * (y, x) — struct ordering here, two-level MIN/MAX CASE in SQL. */
  def m4(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      bucketMillis: Long, quantScale: Int = 6): DataFrame = {
    require(bucketMillis > 0, s"bucketMillis must be positive, got $bucketMillis")
    require(quantScale >= 0 && quantScale <= 9,
      s"quantScale must be in [0, 9], got $quantScale")
    guardCols("m4", keyCol, tsCol, valCol,
      Seq("bucket", "x_first", "y_first", "x_last", "y_last",
        "x_min", "y_min", "x_max", "y_max", "n_points"))
    val pts = df.select(
        col(keyCol).as("__k"),
        floorDivL(unix_micros(col(tsCol)), 1000L).as("__x"),
        floor(col(valCol) * pow(lit(10.0), lit(quantScale))).cast("long")
          .as("__y"))
      .withColumn("__b", floorDivL(col("__x"), bucketMillis))
    pts.groupBy(col("__k"), col("__b"))
      .agg(count(lit(1)).as("n_points"),
        min(struct(col("__x"), col("__y"))).as("__first"),
        max(struct(col("__x"), col("__y"))).as("__last"),
        min(struct(col("__y"), col("__x"))).as("__min"),
        max(struct(col("__y"), col("__x"))).as("__max"))
      .select(col("__k").as(keyCol), col("__b").as("bucket"),
        col("__first.__x").as("x_first"), col("__first.__y").as("y_first"),
        col("__last.__x").as("x_last"), col("__last.__y").as("y_last"),
        col("__min.__x").as("x_min"), col("__min.__y").as("y_min"),
        col("__max.__x").as("x_max"), col("__max.__y").as("y_max"),
        col("n_points"))
  }
}
