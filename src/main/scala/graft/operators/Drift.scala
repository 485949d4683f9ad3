package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two snapshots of the same
  * feature — the aggregate-level companion to [[SnapshotDiff]] (row
  * level) and [[Expectations]] (rule level): "did this column's SHAPE
  * move since the baseline?", the gate a training-data pipeline runs
  * before each refresh and a model-serving stack runs on its inputs.
  *
  * Design for exactness and scale:
  *  - fixed equal-width bins over a CALLER-SUPPLIED [lo, hi) range —
  *    deterministic bucketing with no rank pass (quantile bins would
  *    cost a sort and make the baseline a moving target); out-of-range
  *    rows land in the two open edge bins, so mass never silently
  *    disappears;
  *  - one partial+final count aggregate per side (map-side combined),
  *    then a bounded nBins-row join — corpus-scale work is two scans,
  *    driver/exchange work is parameter-bounded;
  *  - per-bin statistics stay in EXACT integers (counts) plus
  *    quotient doubles computed by the same correctly-rounded IEEE
  *    operation sequence in any engine (divisions and comparisons only —
  *    never a float sum, the cross-engine discipline of the oracle
  *    suite). The chi-square-style contribution
  *    (p_cur − p_base)² / (p_base + ε) is transcendental-free, so a
  *    DuckDB oracle replays it bit for bit; PSI (which needs ln) is
  *    deliberately NOT emitted here — rank/alert on the rational
  *    statistic instead.
  */
object Drift {

  /** Per-bin drift frame between `base` and `cur` on numeric `valueCol`:
    * (bin, lo_edge, hi_edge, n_base, n_cur, p_base, p_cur, contrib,
    * drifted). All `nBins` bins are present (empty ones with zero
    * counts); bin 0 additionally absorbs values < lo and bin nBins-1
    * values >= hi. `contrib` is (p_cur − p_base)²/(p_base + eps);
    * `drifted` flags contrib > threshold. */
  /** The clamped equal-width bin of `c` over [lo, hi) split `nBins`
    * ways — the shared bucketing of the batch gate and the streaming
    * histogram fold (they MUST agree, or streamed counts drift against
    * the batch oracle). */
  def binOf(c: Column, nBins: Int, lo: Double, hi: Double): Column = {
    val width = (hi - lo) / nBins
    least(greatest(floor((c - lo) / width).cast("long"), lit(0L)),
      lit(nBins - 1L))
  }

  /** Per-bin exact counts of `valueCol` — one map-side-combined
    * aggregate; bins with no rows are absent (callers densify).
    * Null/NaN values fail loudly: a null would produce a null bin that
    * silently vanishes from counts AND totals (shrinking proportions
    * without tripping the gate), and NaN has no place on an equal-width
    * axis — the same guard philosophy as [[OrderStats.exactQuantiles]].
    * Monitor null rates with [[categoricalDrift]] (which gives nulls a
    * first-class `__null` category) or an upstream [[Expectations]]
    * rule; this operator contracts on REAL values only. */
  def binCounts(df: DataFrame, valueCol: String, nBins: Int, lo: Double,
      hi: Double): DataFrame = {
    // guard on the CASTED value: a non-null string like "abc" casts to
    // null, and `raw.isNull || isnan(cast)` would evaluate to SQL NULL
    // there — falling through to otherwise() and silently producing the
    // null bin the guard exists to prevent
    val casted = col(valueCol).cast("double")
    val guarded = when(casted.isNull || isnan(casted),
        raise_error(lit(s"binCounts: null/NaN/uncastable value in $valueCol")).cast("double"))
      .otherwise(casted)
    df.select(binOf(guarded, nBins, lo, hi).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
  }

  def binnedDrift(base: DataFrame, cur: DataFrame, valueCol: String,
      nBins: Int, lo: Double, hi: Double,
      threshold: Double = 0.01, eps: Double = 1e-9): DataFrame = {
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    driftFromCounts(
      binCounts(base, valueCol, nBins, lo, hi).withColumnRenamed("n", "n_base"),
      binCounts(cur, valueCol, nBins, lo, hi).withColumnRenamed("n", "n_cur"),
      nBins, lo, hi, threshold, eps)
  }

  /** Categorical drift between two snapshots of a string column — the
    * language-mix / source-mix / label-mix monitoring companion to the
    * numeric [[binnedDrift]]: the top `maxCategories` categories by
    * COMBINED count (ties broken by category, so the set is
    * deterministic) keep their identity, everything else folds into
    * `__other`, and the same exact-count + rational-contribution
    * machinery applies. A category present on only one side simply has
    * zero count on the other — the ε in the contribution keeps the
    * quotient finite, and a brand-new category's contribution explodes
    * past any threshold, which is the alert a mix shift deserves.
    * Output: (category, n_base, n_cur, p_base, p_cur, contrib, drifted),
    * ≤ maxCategories + 1 rows — parameter-bounded. */
  def categoricalDrift(base: DataFrame, cur: DataFrame, valueCol: String,
      maxCategories: Int = 50,
      threshold: Double = 0.01, eps: Double = 1e-9): DataFrame = {
    require(maxCategories >= 1,
      s"maxCategories must be >= 1, got $maxCategories")
    def counts(df: DataFrame, out: String): DataFrame = df
      .select(coalesce(col(valueCol).cast("string"), lit("__null")).as("category"))
      .groupBy("category").agg(count(lit(1)).as(out))
    val b = counts(base, "n_base")
    val c = counts(cur, "n_cur")
    val combined = b.join(c, Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    // deterministic head set: top maxCategories by combined mass, ties
    // by category string — a TakeOrdered, never a full sort
    val head = combined
      .orderBy((col("n_base") + col("n_cur")).desc, col("category").asc)
      .limit(maxCategories)
      .select(col("category"))
    val folded = combined
      .join(broadcast(head.withColumn("__keep", lit(true))), Seq("category"), "left")
      .select(
        when(col("__keep"), col("category")).otherwise(lit("__other")).as("category"),
        col("n_base"), col("n_cur"))
      .groupBy("category")
      .agg(sum(col("n_base")).as("n_base"), sum(col("n_cur")).as("n_cur"))
    val totals = folded.agg(sum(col("n_base")).as("tot_base"),
      sum(col("n_cur")).as("tot_cur"))
    val pBase = when(col("tot_base") === 0, lit(0.0))
      .otherwise(col("n_base").cast("double") / col("tot_base").cast("double"))
    val pCur = when(col("tot_cur") === 0, lit(0.0))
      .otherwise(col("n_cur").cast("double") / col("tot_cur").cast("double"))
    folded.crossJoin(broadcast(totals))
      .withColumn("p_base", pBase)
      .withColumn("p_cur", pCur)
      .withColumn("contrib",
        (col("p_cur") - col("p_base")) * (col("p_cur") - col("p_base")) /
          (col("p_base") + lit(eps)))
      .withColumn("drifted", col("contrib") > threshold)
      .select("category", "n_base", "n_cur", "p_base", "p_cur",
        "contrib", "drifted")
  }

  /** Quantile estimates from per-bin counts — the deterministic
    * mergeable-quantile read the histogram state supports for free:
    * bin counts are exactly mergeable (plain addition — unlike KLL or
    * t-digest, whose randomized/merge-order-dependent compaction defies
    * a cross-engine replay), so the SAME state the drift gate and the
    * streaming fold maintain doubles as a quantile summary with error
    * bounded by one bin width (clamped-tail caveat: mass outside
    * [lo, hi) sits in the edge bins, so tail quantiles saturate at the
    * range ends — size the range like the histogram's).
    *
    * Estimator (replayable rational arithmetic): target = ⌈p·n⌉
    * (computed in DOUBLE, the q89 convention), answer = the UPPER edge
    * of the first bin whose cumulative count reaches the target — a
    * conservative bound that exact-matches any engine. Output: (p,
    * target_rank, est_quantile). */
  def binnedQuantiles(counts: DataFrame, nBins: Int, lo: Double,
      hi: Double, ps: Seq[Double]): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantiles $ps outside [0, 1]")
    val width = (hi - lo) / nBins
    val cum = BoundedWindow.ordered(col("bin"), col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = counts.select(col("bin"), col("n"))
      .withColumn("__cum", sum(col("n")).over(cum))
      .withColumn("__total", max(col("__cum")).over(
        BoundedWindow.ordered(col("bin"), col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val pFrame = counts.sparkSession
      .createDataFrame(ps.map(Tuple1(_))).toDF("p")
    withCum.crossJoin(broadcast(pFrame))
      .withColumn("__target",
        greatest(lit(1L), ceil(col("p") * col("__total")).cast("long")))
      .filter(col("__cum") >= col("__target"))
      .groupBy(col("p"))
      .agg(min(col("bin")).as("__bin"), min(col("__target")).as("target_rank"))
      .select(col("p"), col("target_rank"),
        (lit(lo) + (col("__bin") + 1) * width).as("est_quantile"))
  }

  /** The drift frame from pre-aggregated per-bin counts — the join
    * point for the streaming fold, whose state IS a (bin, n_cur) frame.
    * Absent bins are treated as zero. */
  def driftFromCounts(baseCounts: DataFrame, curCounts: DataFrame,
      nBins: Int, lo: Double, hi: Double,
      threshold: Double = 0.01, eps: Double = 1e-9): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val spark = baseCounts.sparkSession
    val width = (hi - lo) / nBins
    val bins = spark.range(0, nBins).select(col("id").as("bin"))
    val joined = bins
      .join(baseCounts.select(col("bin"), col("n_base")), Seq("bin"), "left")
      .join(curCounts.select(col("bin"), col("n_cur")), Seq("bin"), "left")
      .select(col("bin"),
        (lit(lo) + col("bin") * width).as("lo_edge"),
        (lit(lo) + (col("bin") + 1) * width).as("hi_edge"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    // totals ride a scalar cross-join of ONE row (computed once, never a
    // per-row recount); quotient math follows in a single projection
    val totals = joined.agg(sum(col("n_base")).as("tot_base"),
      sum(col("n_cur")).as("tot_cur"))
    // an EMPTY side would make every proportion 0/0 = NaN, and Spark
    // orders NaN above any double — every bin would silently flag as
    // drifted; an empty snapshot means "no evidence", so its shares are 0
    val pBase = when(col("tot_base") === 0, lit(0.0))
      .otherwise(col("n_base").cast("double") / col("tot_base").cast("double"))
    val pCur = when(col("tot_cur") === 0, lit(0.0))
      .otherwise(col("n_cur").cast("double") / col("tot_cur").cast("double"))
    joined.crossJoin(broadcast(totals))
      .withColumn("p_base", pBase)
      .withColumn("p_cur", pCur)
      .withColumn("contrib",
        (col("p_cur") - col("p_base")) * (col("p_cur") - col("p_base")) /
          (col("p_base") + lit(eps)))
      .withColumn("drifted", col("contrib") > threshold)
      .select("bin", "lo_edge", "hi_edge", "n_base", "n_cur",
        "p_base", "p_cur", "contrib", "drifted")
  }
}
