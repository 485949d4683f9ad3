package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy audit for dataset publication: k-anonymity + l-diversity over
  * a quasi-identifier combination (Sweeney's k-anonymity; Machanavajjhala
  * et al.'s l-diversity) — the governance gate a training-data release
  * runs AFTER PII scrubbing (q52/q163 remove direct identifiers; this
  * audits what the remaining quasi-identifiers still re-identify).
  *
  * Per equivalence class (one row per distinct QI combination): the
  * class size (k-anonymity requires every class ≥ k — any smaller class
  * makes its members linkable), and the number of DISTINCT sensitive
  * values (l-diversity requires ≥ l — a k-anonymous class whose members
  * all share one sensitive value still leaks it). Both gates emitted as
  * integer bits, all arithmetic exact.
  *
  * Scale shape: ONE groupBy over the QI columns with map-side partial
  * aggregation (count + the count-distinct expansion Spark plans for
  * exact distinct) — auditing a 100 TB release costs one pass; the
  * output is equivalence-class sized, which for a sane QI choice is
  * tiny. No row-level data survives into the report. */
object Anonymity {

  def audit(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      k: Long, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "at least one quasi-identifier column required")
    require(!qiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    require(k >= 1 && l >= 1, s"k and l must be >= 1, got k=$k l=$l")
    val reserved = Seq("n_rows", "n_distinct_sensitive", "k_ok", "l_ok")
    require(reserved.forall(c => !df.columns.contains(c)),
      s"column names $reserved are reserved by audit")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_distinct_sensitive"))
      .withColumn("k_ok", when(col("n_rows") >= k, 1L).otherwise(0L))
      .withColumn("l_ok",
        when(col("n_distinct_sensitive") >= l, 1L).otherwise(0L))
  }
}
