package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** 2D skyline (Pareto frontier): the rows not dominated by any other row,
  * where p dominates q iff p.x ≥ q.x ∧ p.y ≥ q.y with at least one
  * strict — "best tradeoff" queries (quality vs brevity over a corpus,
  * recall vs cost over index configs).
  *
  * The naive formulation is a NOT EXISTS theta self-join — O(n²)
  * compared pairs (q135's oracle states exactly that). The set-oriented
  * rewrite here is the classic sort-scan skyline made declarative, with
  * the scan decomposed the same two-level way as
  * [[OrderStats.paretoClass]] so NO window ever runs unpartitioned over
  * data-sized input:
  *
  *   1. collapse to one candidate per distinct x: only max(y) at each x
  *      can survive (anything below it is dominated at equal x) — a plain
  *      map-side-combined aggregate, the ONLY pass over the full data;
  *   2. equal-width x-cells over [min x, max x] (the cell is a MONOTONE
  *      function of x, so cells tile the x order); a candidate at x is
  *      dominated iff some strictly-greater x carries y' ≥ y, and every
  *      strictly-greater x is either IN the candidate's cell or in a
  *      strictly-greater cell — so the running max(y) from greater x
  *      splits EXACTLY into
  *        a. an in-cell window PARTITIONED BY cell (cell-sized sorts,
  *           cells run in parallel), plus
  *        b. a cross-cell running max over the ≤ `bins` cell maxima —
  *           the only unpartitioned window, parameter-bounded;
  *      a candidate survives iff its y strictly exceeds the max of the
  *      two (greatest() skips nulls, so edge cells compose correctly);
  *   3. join the surviving (x, y) pairs back (broadcast: a frontier is
  *      tiny) to recover ALL original rows sitting exactly on the
  *      frontier (duplicates of a frontier point are mutually
  *      non-dominating and all kept).
  *
  * Scale shape: the O(n) per-x aggregate dominates; step 2's sorts are
  * cell-sized regardless of how many distinct x values exist (the fix
  * for continuous-x inputs, where distinct-x ≈ corpus size and the old
  * single running-max window degenerated to one corpus-sized task). The
  * one-row min/max collect is the [[OrderStats.paretoClass]] precedent.
  *
  * Ties: equal (x, y) rows are all emitted — neither dominates the
  * other. Null x or y rows are dropped (domination against null is
  * undefined). `xCol` must be numeric (it is binned); `yCol` needs only
  * an ordering. */
object Skyline {

  def frontier2D(df: DataFrame, xCol: String, yCol: String,
      bins: Int = 65536): DataFrame = {
    require(bins >= 1, s"need at least 1 bin, got $bins")
    require(df.schema(xCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"frontier2D bins on $xCol, which must be numeric; " +
        s"got ${df.schema(xCol).dataType.simpleString}")
    val reserved = Set("__x", "__maxy", "__bin", "__dom", "__domin",
      "__domabove", "__c_bin")
    require(!df.columns.exists(reserved.contains),
      s"column names $reserved are reserved by frontier2D")
    val clean = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val perX = clean.groupBy(col(xCol).as("__x"))
      .agg(max(col(yCol)).as("__maxy"))

    // one row: the x extremes for binning (parameter-bounded collect,
    // the paretoClass/KMeans.fit discipline)
    val s = perX.agg(min(col("__x").cast("double")),
      max(col("__x").cast("double"))).head()
    if (s.isNullAt(0)) return clean.limit(0).select(df.columns.map(col): _*)
    val (mn, mx) = (s.getDouble(0), s.getDouble(1))

    val binned = perX.withColumn("__bin",
      if (mx == mn) lit(0)
      else OrderStats.clampedBin(
        (col("__x").cast("double") - mn) / (mx - mn), bins))

    // (a) running max(y) from strictly-greater x INSIDE the cell
    val wIn = Window.partitionBy(col("__bin")).orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val inCell = binned.withColumn("__domin", max(col("__maxy")).over(wIn))

    // (b) running max of cell maxima from strictly-greater cells — the
    // only unpartitioned window, over ≤ bins rows
    val wCells = BoundedWindow.ordered(col("__bin"), col("__bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cellsAbove = binned.groupBy(col("__bin"))
      .agg(max(col("__maxy")).as("__cellmax"))
      .withColumn("__domabove", max(col("__cellmax")).over(wCells))
      .select(col("__bin").as("__c_bin"), col("__domabove"))

    val frontier = inCell
      .join(broadcast(cellsAbove), col("__bin") === col("__c_bin"))
      .withColumn("__dom", greatest(col("__domin"), col("__domabove")))
      .filter(col("__dom").isNull || col("__dom") < col("__maxy"))
      .select(col("__x"), col("__maxy"))
    clean.join(broadcast(frontier),
        col(xCol) === col("__x") && col(yCol) === col("__maxy"))
      .select(df.columns.map(col): _*)
  }
}
