package graft.operators

import org.apache.spark.sql.DataFrame
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
          .otherwise(least(lit(bins - 1), greatest(lit(0),
            floor((col("__v") - col("__min")) /
              (col("__max") - col("__min")) * lit(bins - 1)).cast("int")))))
      .drop("__s_stratum", "__min", "__max")

    val wBin = Window.partitionBy(col("__stratum")).orderBy(col("__bin"))
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
}
