package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics at corpus scale — the "p50/p99 of a metric per
  * key" primitive. Spark ships approx_percentile (sketched, no exactness
  * contract) and exact `percentile` (which plans the whole group through
  * one aggregation buffer); the naive exact form is a window rank over
  * `partitionBy(stratum)` — one task sorts a billion rows for a hot key.
  * This gets the EXACT discrete quantile with the same two-pass value-
  * histogram plan as [[Sampling.topFractionByScore]]: per-stratum stats,
  * equal-width value cells, small-frame cumulative counts, and a row sort
  * of ONLY each quantile's straddling cell (~n/bins of the stratum).
  */
object OrderStats {

  /** The shared clamp-and-floor of the equal-width binning contract:
    * `frac` is the caller's position ratio inside [min, max] (ascending
    * or descending — direction is the caller's), the result is a bin
    * index in [0, bins-1]. One definition keeps the three histogram
    * operators (exactQuantiles, paretoClass, Sampling.topFractionByScore)
    * in lockstep — the clamp and the *(bins-1) scaling are load-bearing
    * for their cell-cover proofs. Callers handle the max==min degenerate
    * before calling (frac would divide by zero). */
  private[operators] def clampedBin(frac: Column, bins: Int): Column =
    least(lit(bins - 1), greatest(lit(0),
      floor(frac * lit(bins - 1)).cast("int")))

  /** For each stratum and each p in `ps`: the value at 1-based rank
    * max(1, ceil(p·n)) in ascending value order — the discrete (lower)
    * quantile. No interpolation: the result is an actual data value,
    * which keeps it engine-portable bit-for-bit. Ties need no tie-break:
    * the rank-r VALUE under (value ASC) is the same for any stable order
    * within equal values, and equal values share a histogram cell by
    * construction.
    *
    * The rank is computed as ceil(p × n) in DOUBLE on purpose — an exact-
    * decimal p×n differs from the IEEE product near integers (0.9 × 10 =
    * 9.000000000000002 in double → ceil 10, vs 9 exactly in decimal); the
    * oracle must multiply in double too, and then both engines agree
    * everywhere.
    *
    * Output: one row per (stratum, p) — (stratumCol, p, n, q).
    * Null/NaN values fail loudly (they would poison min/max binning),
    * same philosophy as topFractionByScore. */
  def exactQuantiles(df: DataFrame, valueCol: String, stratumCol: String,
      ps: Seq[Double], bins: Int = 65536): DataFrame = {
    require(ps.nonEmpty, "at least one quantile required")
    ps.foreach(p => require(p >= 0.0 && p <= 1.0, s"quantile $p outside [0, 1]"))
    require(bins >= 2, s"need at least 2 bins, got $bins")

    val guarded = when(col(valueCol).isNull || isnan(col(valueCol).cast("double")),
        raise_error(concat(
          lit(s"exactQuantiles: null/NaN value in $valueCol"),
          lit(""))).cast("double"))
      .otherwise(col(valueCol).cast("double"))
    val rows = df.select(col(stratumCol).as("__stratum"), guarded.as("__v"))

    val stats = rows.groupBy(col("__stratum"))
      .agg(min(col("__v")).as("__min"), max(col("__v")).as("__max"),
        count(lit(1)).as("__n"))

    // one target rank per (stratum, p); stats is one row per stratum, so
    // targets is |strata| x |ps| — always a broadcast-sized frame
    val targets = stats
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .withColumn("__r", greatest(lit(1L),
        ceil(col("p") * col("__n")).cast("long")))
      .select(col("__stratum").as("__t_stratum"), col("p"),
        col("__n"), col("__r"))

    val statsA = stats.select(col("__stratum").as("__s_stratum"),
      col("__min"), col("__max"))
    val binned2 = rows.join(broadcast(statsA),
        col("__stratum") <=> col("__s_stratum"))
      .withColumn("__bin",
        when(col("__max") === col("__min"), lit(0))
          .otherwise(clampedBin((col("__v") - col("__min")) /
            (col("__max") - col("__min")), bins)))
      .drop("__s_stratum", "__min", "__max")

    // second key is BoundedWindow's constant: when the caller's stratum
    // is a LITERAL (the one-stratum q155/q207/q217 shape),
    // FoldablePropagation folds __stratum away and would otherwise prune
    // the spec to an unpartitioned WindowExec; the frame stays ≤ bins
    // rows per stratum either way
    val wBin = Window
      .partitionBy(col("__stratum"), BoundedWindow.key(col("__bin")))
      .orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cells = binned2.groupBy(col("__stratum"), col("__bin"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__cum", sum(col("__cnt")).over(wBin))
      .withColumn("__cum_before", col("__cum") - col("__cnt"))

    // each (stratum, p) names exactly one straddling cell; targets is the
    // |strata| x |ps| side — always the broadcast side
    val straddle = cells.join(broadcast(targets),
        col("__t_stratum") <=> col("__stratum") &&
          col("__cum_before") < col("__r") && col("__r") <= col("__cum"))
      .select(col("__t_stratum"), col("p"), col("__n"), col("__r"),
        col("__bin").as("__t_bin"), col("__cum_before"))

    // rank only the straddling cells' rows; a cell can serve several p's
    val candidates = binned2.join(broadcast(straddle),
        col("__stratum") <=> col("__t_stratum") &&
          col("__bin") === col("__t_bin"))
    val wCell = Window.partitionBy(col("__stratum"), col("p"))
      .orderBy(col("__v").asc)
    candidates
      .withColumn("__rn", row_number().over(wCell))
      .filter(col("__rn") === col("__r") - col("__cum_before"))
      .select(col("__stratum").as(stratumCol), col("p"),
        col("__n").as("n"), col("__v").as("q"))
  }

  /** Exact weighted cumulative share with Pareto/ABC classification — the
    * "which 20% of keys carry 80% of the mass" inventory primitive. The
    * naive form is a running SUM over the GLOBAL (units DESC, key ASC)
    * order: one task sorts and scans every key. This computes the same
    * exact prefix with a two-level plan that never materializes a global
    * sort of the data:
    *
    *   1. equal-width value cells over [min, max] (bin is a monotone
    *      function of units, so cells tile the global order);
    *   2. in-cell prefix sums via a window PARTITIONED BY cell — every
    *      sort is cell-sized and cells run in parallel;
    *   3. cell totals (≤ `bins` rows) take one bounded-size cumulative
    *      pass, and each row's global prefix = units in strictly-higher
    *      cells + its in-cell prefix.
    *
    * All accumulation is DECIMAL(38,0) over the caller's integer units and
    * the class cut `100·cum_before < pct·total` is cross-multiplied — no
    * float share ever materializes, so the result is bit-identical across
    * engines and partitionings. A key is 'A' while the cumulative mass
    * BEFORE it is under `aPct`% of the total (so the heaviest key is
    * always 'A'), 'B' under `bPct`%, else 'C'.
    *
    * Output: (keyCol, unitsCol, cum_units BIGINT, abc) — cum_units is the
    * inclusive prefix under (units DESC, key ASC).
    *
    * Degenerate case: a single distinct unit value collapses to one cell
    * (one cell-sized sort); classification is meaningless there anyway.
    * Null or negative units fail loudly — they have no place on a
    * cumulative-share curve.
    *
    * Precondition: `keyCol` values must be UNIQUE (i.e. `df` is already
    * grouped, one row per key — what every ABC analysis feeds in). The
    * (units DESC, key ASC) order is only total under that assumption;
    * with duplicate (key, units) rows the in-cell prefix order over the
    * duplicates is underdetermined and `cum_units` could differ between
    * runs/engines. Callers holding raw event rows must aggregate to
    * per-key units first (as q146 does). */
  def paretoClass(df: DataFrame, keyCol: String, unitsCol: String,
      aPct: Int = 80, bPct: Int = 95, bins: Int = 65536): DataFrame = {
    require(aPct > 0 && aPct <= bPct && bPct <= 100,
      s"need 0 < aPct <= bPct <= 100, got ($aPct, $bPct)")
    require(bins >= 2, s"need at least 2 bins, got $bins")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)

    val guarded = when(col(unitsCol).isNull || col(unitsCol) < 0,
        raise_error(concat(lit(s"paretoClass: null/negative units in $unitsCol")))
          .cast("long"))
      .otherwise(col(unitsCol).cast("long"))
    val rows = df.select(col(keyCol).as("__key"), guarded.as("__w"))

    // one row: global extremes for binning + the total mass for the cuts —
    // parameter-bounded driver collect (the KMeans.fit / TfIdf.fitVocab
    // pattern), which keeps the corpus pass below join-free
    val s = rows.agg(min(col("__w")).as("mn"), max(col("__w")).as("mx"),
      sum(col("__w").cast(dec38)).as("tot")).head()
    if (s.isNullAt(0))
      return rows.limit(0).select(col("__key").as(keyCol),
        col("__w").as(unitsCol), col("__w").as("cum_units"),
        lit("A").as("abc"))
    val (mn, mx) = (s.getLong(0), s.getLong(1))
    val total = lit(s.getDecimal(2)).cast(dec38)

    val binned = rows.withColumn("__bin",
      if (mx == mn) lit(0)
      else clampedBin((col("__w") - mn).cast("double") /
        lit((mx - mn).toDouble), bins))

    val wIn = Window.partitionBy(col("__bin"))
      .orderBy(col("__w").desc, col("__key").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPrefix = binned
      .withColumn("__cum_in", sum(col("__w").cast(dec38)).over(wIn))

    // cell totals: ≤ bins rows, so the unpartitioned cumulative window is
    // parameter-bounded (never the full-corpus single-task sort)
    val wCells = BoundedWindow.ordered(col("__bin"), col("__bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cellsCum = binned.groupBy(col("__bin"))
      .agg(sum(col("__w").cast(dec38)).as("__cell"))
      .withColumn("__above",
        coalesce(sum(col("__cell")).over(wCells), lit(0).cast(dec38)))
      .select(col("__bin").as("__c_bin"), col("__above"))

    withPrefix.join(broadcast(cellsCum), col("__bin") === col("__c_bin"))
      .withColumn("__cum", col("__above") + col("__cum_in"))
      .withColumn("__before", col("__cum") - col("__w").cast(dec38))
      .select(col("__key").as(keyCol), col("__w").as(unitsCol),
        col("__cum").cast("long").as("cum_units"),
        when(col("__before") * 100 < total * aPct, "A")
          .when(col("__before") * 100 < total * bPct, "B")
          .otherwise("C").as("abc"))
  }
}
