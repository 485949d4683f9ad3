package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 versioning: turn an append-only
  * change log (key, ts, attributes…) into validity intervals — the
  * warehouse-ETL primitive behind "what did this row look like on
  * date X" dimension tables, and the batch form of the streaming
  * upsert the reference's pipeline feeds into Postgres.
  *
  * Semantics (what the q96 oracle pins): per key, order changes by ts;
  * consecutive rows whose tracked attributes are unchanged are NO-OPS
  * and merge into their predecessor's interval (a change log built from
  * periodic snapshots is mostly no-ops); each surviving change holds
  * [valid_from = its ts, valid_to = next change's ts) — half-open, so
  * intervals tile each key's timeline without overlap — and the last
  * version has valid_to = null + is_current = true.
  *
  * Scale shape: two windows over the SAME (key × ts) partitioning — one
  * lag to flag no-ops, one lead for interval ends — so the whole op is
  * ONE hash exchange on the key; nothing else shuffles. Per-key history
  * is the partition unit: dimension keys with pathological churn are
  * the caller's skew to salt; ordinary dimensions (users, products,
  * profiles) sit far under any task limit.
  *
  * Duplicate (key, ts) rows have no defined version order and would
  * make the intervals nondeterministic, so they FAIL the job loudly
  * (same discipline as tokenBudgetSample's weight guard). */
object Scd2 {

  def versionize(df: DataFrame, keyCol: String, tsCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "at least one tracked attribute required")
    val reserved = Set("__prev_ts", "__attrs", "__prev_attrs", "valid_from",
      "valid_to", "is_current")
    require(df.columns.forall(!reserved.contains(_)),
      s"column names $reserved are reserved by versionize")

    // every window shares ONE spec (partition by key, order by ts), so
    // Catalyst plans a single Window node: one exchange, one sort — the
    // duplicate guard rides the same lag pass (a duplicate ts equals its
    // predecessor's, so at least one row of any duplicate pair trips it)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val attrs = struct(attrCols.map(col): _*)
    val attrsType = df.select(attrs.as("a")).schema.head.dataType.catalogString
    df.withColumn("__prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("__attrs",
        when(col("__prev_ts") <=> col(tsCol), raise_error(concat(
          lit(s"versionize: duplicate ($keyCol, $tsCol) at "),
          col(keyCol).cast("string"), lit(" / "), col(tsCol).cast("string")))
          .cast(attrsType))
        .otherwise(attrs))
      .withColumn("__prev_attrs", lag(col("__attrs"), 1).over(w))
      // first version per key, or a real attribute change
      .filter(col("__prev_attrs").isNull || !(col("__attrs") <=> col("__prev_attrs")))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev_ts", "__attrs", "__prev_attrs", tsCol)
  }

  /** Point-in-time dimension lookup — the standard consumer of
    * [[versionize]]: each fact row left-enriched with the dimension
    * version valid at its timestamp (valid_from <= ts, and ts <
    * valid_to unless open-ended). An EQUI-join on the key with the
    * interval predicate as a residual filter — a plain hash join, never
    * a nested loop: SCD2 intervals tile, so each fact matches at most
    * one version and per-key version lists are short by construction
    * (facts × versions fan-in is bounded by history length, not data
    * volume). */
  def temporalLookup(facts: DataFrame, dim: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    require(dim.columns.contains("valid_from") &&
      dim.columns.contains("valid_to"),
      "dim must be a versionize() output (valid_from/valid_to)")
    val d = dim.withColumnRenamed(keyCol, "__dim_key")
    facts.join(d,
        facts(keyCol) === d("__dim_key") &&
          d("valid_from") <= facts(tsCol) &&
          (d("valid_to").isNull || facts(tsCol) < d("valid_to")),
        "left")
      .drop("__dim_key")
  }
}
