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
  * rewrite here is the classic sort-scan skyline made declarative:
  *
  *   1. collapse to one candidate per distinct x: only max(y) at each x
  *      can survive (anything below it is dominated at equal x) — a plain
  *      map-side-combined aggregate, the ONLY pass over the full data;
  *   2. over the |distinct x| aggregated rows, a running max(y) from
  *      strictly-greater x: a candidate survives iff its y strictly
  *      exceeds every y seen at larger x — one window over the
  *      aggregate, never over raw rows;
  *   3. join the surviving (x, y) pairs back (broadcast: a frontier is
  *      tiny) to recover ALL original rows sitting exactly on the
  *      frontier (duplicates of a frontier point are mutually
  *      non-dominating and all kept).
  *
  * Scale shape: the O(n) aggregate dominates; the global-order window
  * runs over distinct-x rows only (bounded by the value domain, not the
  * corpus — and skylines of continuous domains are still tiny relative
  * to input). If distinct x itself approaches corpus size, the same
  * lossless prune composes hierarchically: coarse-bucket max(y) first,
  * discard buckets dominated by any strictly-greater bucket's max, exact
  * pass over survivors.
  *
  * Ties: equal (x, y) rows are all emitted — neither dominates the
  * other. Null x or y rows are dropped (domination against null is
  * undefined). */
object Skyline {

  def frontier2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val reserved = Set("__x", "__maxy", "__dom")
    require(!df.columns.exists(reserved.contains),
      s"column names $reserved are reserved by frontier2D")
    val clean = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val perX = clean.groupBy(col(xCol).as("__x"))
      .agg(max(col(yCol)).as("__maxy"))
    val fromGreaterX = Window.orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perX
      .withColumn("__dom", max(col("__maxy")).over(fromGreaterX))
      .filter(col("__dom").isNull || col("__dom") < col("__maxy"))
      .select(col("__x"), col("__maxy"))
    clean.join(broadcast(frontier),
        col(xCol) === col("__x") && col(yCol) === col("__maxy"))
      .select(df.columns.map(col): _*)
  }
}
