package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: all pairs (l, r) with matching keys and
  * r.ts ∈ [l.ts + lower, l.ts + upper) — the event-correlation operator
  * (views preceding a click, readings around an alarm, trades near a
  * quote). The as-of join ([[AsOfJoin]]) picks ONE right row per left row;
  * this one keeps EVERY right row inside the window.
  *
  * Spark has no native batch range join: writing the time bound into a
  * join condition alongside the equi-key works (SortMergeJoin evaluates the
  * range residually), but every (key, l, r) pair for a key is still
  * generated before the residual filter — a hot key with n events explodes
  * to n² compared rows regardless of how narrow the window is. The classic
  * fix (used by every warehouse range-join optimization) is BINNING:
  *
  *   - bin width w = upper - lower (the window span, in seconds);
  *   - each RIGHT row lands in one bin: floorDiv(sec(r.ts), w);
  *   - each LEFT row's window [l+lower, l+upper) spans EXACTLY two
  *     consecutive bins b0 = floorDiv(sec(l.ts) + lower, w) and b0+1
  *     (second-truncation analysis in the bin-cover proof below);
  *   - equi-join on (key, bin), then apply the exact sub-second predicate.
  *
  * The join becomes a plain hash/sort-merge EQUI-join with a 2× left
  * duplication factor: compared pairs are bounded by rows-per-(key, bin) —
  * i.e. by how many events actually fall inside any one window span — not
  * by rows-per-key. At 100 TB that is the difference between a shuffle
  * keyed on (user, 6-hour bucket) and a per-user cartesian product. Skewed
  * (key, bin) buckets (a bot user in one hour) are ordinary join skew,
  * handled by AQE skew-join splitting; a small right side still broadcasts.
  *
  * Bin-cover proof (second truncation): let s(x) = floor(epoch seconds).
  * For a matching pair, exact(r) ≥ exact(l) + lower ≥ s(l) + lower, so
  * s(r) ≥ s(l) + lower; and exact(r) < exact(l) + upper < s(l) + 1 + upper,
  * so s(r) ≤ s(l) + upper. Thus s(r) ∈ [s(l)+lower, s(l)+upper], an
  * inclusive span of length w covering exactly bins b0 and b0+1. Candidate
  * generation on truncated seconds therefore loses no pair, and the final
  * filter on the full-precision timestamps keeps semantics exact.
  */
object IntervalJoin {

  /** Integer floorDiv as a Column expression: pmod yields the nonnegative
    * remainder, so (x - pmod(x, w)) / w is exact floor division even for
    * negative x (epoch + negative lower can cross zero in principle).
    * Shared with [[Resample]], [[SpatialJoin]], and
    * [[TimeSeriesOps.ewma]] — Spark's `div` truncates toward zero and
    * would misalign pre-1970 cells. The division runs in DECIMAL: the
    * dividend is exactly divisible, and Spark's plain `/` on longs is a
    * DOUBLE division that could round a >2^53 input. */
  private[operators] def floorDiv(x: Column, w: Long): Column =
    ((x - pmod(x, lit(w)))
      .cast(org.apache.spark.sql.types.DecimalType(38, 0)) / w).cast("long")

  /** All (left, right) pairs with left(leftKey) == right(rightKey) and
    * right(rightTs) in [left(leftTs) + lowerSec, left(leftTs) + upperSec).
    *
    * Column names must be disjoint across the two inputs (alias first —
    * same contract as a plain join with overlapping names).
    *
    * @param lowerSec window start offset in seconds, inclusive (negative =
    *                 right rows BEFORE the left timestamp)
    * @param upperSec window end offset in seconds, exclusive; must be
    *                 strictly greater than lowerSec
    */
  def joinWithin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      lowerSec: Long, upperSec: Long): DataFrame =
    binned(left, right, Some((leftKey, rightKey)), leftTs, rightTs,
      lowerSec, upperSec)

  /** The UNKEYED variant: every (left, right) pair with
    * right(rightTs) in [left(leftTs) + lowerSec, left(leftTs) + upperSec),
    * regardless of any key — global time-window correlation (all events
    * near an incident, trades around any news item). The bin IS the whole
    * equi-key, which [[joinWithin]] cannot express (its key columns are
    * required).
    *
    * Scale shape: identical binning, so compared pairs are bounded by
    * rows-per-BIN — i.e. by global event density inside one window span —
    * never |left| × |right|. That bound is the honest cost of an unkeyed
    * correlation: with w seconds of window over T seconds of history the
    * join compares ~|L|·|R|·(2w/T) pairs; keep the window narrow relative
    * to the data's span. Parallelism comes from the time axis (one hash
    * partition per bin), so a year of data at a 5-minute window spreads
    * over ~100k bins; a single-bin hot spot (everything in one flash
    * window) is AQE skew-split like any hot equi-key. */
  def joinWithinAll(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String,
      lowerSec: Long, upperSec: Long): DataFrame =
    binned(left, right, None, leftTs, rightTs, lowerSec, upperSec)

  private def binned(left: DataFrame, right: DataFrame,
      keys: Option[(String, String)], leftTs: String, rightTs: String,
      lowerSec: Long, upperSec: Long): DataFrame = {
    require(upperSec > lowerSec,
      s"empty window: [$lowerSec, $upperSec) — upperSec must exceed lowerSec")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"column names $overlap appear on both sides; alias before joining")
    val reserved = Set("__bin", "__bins")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"column names $reserved are reserved by joinWithin")
    val w = upperSec - lowerSec

    val leftSec = unix_timestamp(col(leftTs))
    val b0 = floorDiv(leftSec + lowerSec, w)
    // sequence(b0, b0+1) not array(b0, b0+1): identical here, but sequence
    // keeps the two-bin invariant explicit and cheap to audit in the plan
    val taggedLeft = left
      .filter(col(leftTs).isNotNull)
      .withColumn("__bins", sequence(b0, b0 + 1))
      .withColumn("__bin", explode(col("__bins")))
      .drop("__bins")
    val taggedRight = right
      .filter(col(rightTs).isNotNull)
      .withColumn("__bin", floorDiv(unix_timestamp(col(rightTs)), w))

    // exact predicate on full-precision timestamps; the bin equi-key only
    // bounds the candidate set
    val exact =
      col(rightTs) >= timestamp_add("SECOND", lit(lowerSec), col(leftTs)) &&
      col(rightTs) < timestamp_add("SECOND", lit(upperSec), col(leftTs))
    val binEq = taggedLeft("__bin") === taggedRight("__bin")
    val cond = keys.fold(binEq) { case (lk, rk) =>
      taggedLeft(lk) === taggedRight(rk) && binEq
    }
    taggedLeft.join(taggedRight, cond && exact).drop("__bin")
  }

  /** Interval-OVERLAP join: all (left, right) pairs whose closed intervals
    * [ls, le] and [rs, re] intersect (ls ≤ re AND rs ≤ le) under matching
    * keys — the interval×interval sibling of [[joinWithin]]'s
    * point-in-interval shape (session overlap, maintenance-window
    * conflicts, reservation double-booking).
    *
    * Bounds are plain LONGs in any shared unit (epoch-micros for time,
    * but any numeric domain bins the same way) — callers convert
    * timestamps once with [[TimeSeriesOps.eventMicros]].
    *
    * Scale shape: each interval explodes into the `binWidth`-wide bins it
    * covers (⌈len/binWidth⌉+1 rows — pick binWidth near the typical
    * interval length so the fan-out stays ~2×), candidates come from a
    * plain equi-join on (key, bin), and compared pairs are bounded by
    * intervals-alive-per-bin, never per-key². A pair overlapping across
    * MANY shared bins is emitted ONCE without any distinct pass: the join
    * keeps only the anchor bin floorDiv(max(ls, rs)) — the bin holding the
    * overlap's start, which lies in both sides' covered ranges exactly
    * when the intervals intersect (max(ls,rs) ∈ [ls,le] ∧ ∈ [rs,re]), so
    * each qualifying pair survives in exactly one bin. No dedup shuffle,
    * no pair ever counted twice.
    *
    * Degenerate guard: rows with null bounds or end < start are dropped
    * (an inverted interval is an upstream bug; overlap against it is
    * undefined). */
  def overlapJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      lsCol: String, leCol: String, rsCol: String, reCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlapCols = left.columns.toSet.intersect(right.columns.toSet)
    require(overlapCols.isEmpty,
      s"column names $overlapCols appear on both sides; alias before joining")
    val reserved = Set("__bin")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"column names $reserved are reserved by overlapJoin")

    def tag(df: DataFrame, s: String, e: String) = df
      .filter(col(s).isNotNull && col(e).isNotNull && col(e) >= col(s))
      .withColumn("__bin",
        explode(sequence(floorDiv(col(s), binWidth), floorDiv(col(e), binWidth))))

    val l = tag(left, lsCol, leCol)
    val r = tag(right, rsCol, reCol)
    val anchor = floorDiv(greatest(l(lsCol), r(rsCol)), binWidth)
    val cond =
      l(leftKey) === r(rightKey) &&
      l("__bin") === r("__bin") &&
      l("__bin") === anchor &&
      l(lsCol) <= r(reCol) && r(rsCol) <= l(leCol)
    l.join(r, cond).drop("__bin")
  }
}
