package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiling — the "know your data" audit a 100 TB
  * ingest runs before anything else: per column, row count, null count,
  * distinct count, and min/max (rendered as strings so one tall frame
  * covers every column type). The profile is what catches the broken
  * upstream export (a column suddenly 40% null, a cardinality collapse,
  * a timestamp range in 1970) before a week of compute runs on it.
  *
  * Scale shape: ONE aggregate job over the scan — no per-column passes.
  * With `exact = false` (the 100 TB default) distinct counts come from
  * HLL sketches and the plan stays a plain two-phase aggregate with
  * map-side partials and NO row expansion; `exact = true` uses
  * COUNT(DISTINCT) — Spark plans multi-distinct aggregates via Expand
  * (one duplicated stream per distinct column), the standard exact plan,
  * worth its cost only when the profile IS the product (it is the
  * oracle-checkable configuration q97 pins; ProfileSpec pins the approx
  * plan's expansion-free shape and bounds its error against exact).
  *
  * Min/max comparisons are binary/codepoint for strings in both Spark
  * and DuckDB (no collation), so the rendered extremes are
  * engine-portable as-is; numeric long→string renders identically —
  * q97 profiles long and string columns, the cross-engine-stable set. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "at least one column required")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))

    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    } :+ count(lit(1)).as("__n")

    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"),
        col(s"__mx_$c").as("max_value"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}
