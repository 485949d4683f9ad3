package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one sanctioned crossing between graft's custom logical plans and a
  * user-facing DataFrame. `Dataset.ofRows` is `private[sql]`, so this
  * object lives in a subpackage of `org.apache.spark.sql` — the standard
  * pattern for Spark extension libraries that construct their own
  * [[LogicalPlan]] nodes (Catalyst has no public factory for that; the
  * blessed `SparkSessionExtensions` hooks inject rules/strategies but not
  * plan constructors). Nothing else belongs here: keep every other graft
  * source under the `graft` package.
  */
object PlanBridge {

  /** Wrap an analyzer-ready logical plan as a DataFrame of the session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed plan behind a DataFrame (resolved attributes included). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
