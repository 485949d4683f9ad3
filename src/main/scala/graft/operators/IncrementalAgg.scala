package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance (materialized-view delta merge):
  * keep a small per-key STATE frame — count, exact decimal sum, min,
  * max — and fold each new batch into it by re-aggregating state ∪
  * partial(batch). The 100 TB point: the base data is NEVER rescanned —
  * each maintenance run touches only the delta and the state (|keys|
  * rows), turning a daily full-table rollup into a delta-sized job.
  *
  * Exactness contract: the sum is DECIMAL, so partial-then-merge is
  * associative, commutative, and bit-identical to a full recompute in
  * ANY batching/order — which is exactly what q100 pins cross-engine
  * (merged halves vs the oracle's single full aggregate) and
  * IncrementalAggSpec fuzzes (random splits ≡ full). count/min/max are
  * trivially mergeable; avg derives as sum/count at read time. Distinct
  * counts are deliberately absent: they are not mergeable exactly at
  * bounded state (that is [[Profile]]'s HLL territory).
  */
object IncrementalAgg {

  private val stateCols = Seq("n_rows", "sum_v", "min_v", "max_v")

  /** The mergeable state of `valueCol` grouped by `keys`:
    * (keys…, n_rows, sum_v DECIMAL(28,4), min_v, max_v). */
  def state(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    require(keys.nonEmpty, "at least one key required")
    require(keys.forall(!stateCols.contains(_)),
      s"key names $stateCols are reserved by IncrementalAgg")
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast(DecimalType(18, 4)))
          .cast(DecimalType(28, 4)).as("sum_v"),
        min(col(valueCol).cast("double")).as("min_v"),
        max(col(valueCol).cast("double")).as("max_v"))
  }

  /** Merge states (state frames and/or fresh batch partials): one
    * re-aggregate over their union. Keys are every non-state column;
    * all inputs must share the state schema. */
  def merge(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "at least one state required")
    val keys = states.head.columns.filterNot(stateCols.contains).toSeq
    states.foreach(s => require(s.columns.toSeq == states.head.columns.toSeq,
      "all states must share one schema"))
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("sum_v")).cast(DecimalType(28, 4)).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }
}

/** The distinct-count companion [[IncrementalAgg]] deliberately leaves
  * out: APPROXIMATE distinct maintenance with bounded mergeable state,
  * via Spark's built-in DataSketches HLL functions (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate` — public API since 3.5).
  *
  * Why a sketch and not a count: COUNT(DISTINCT) is not mergeable —
  * merging per-batch distinct counts double-counts keys seen in two
  * batches, and keeping the full key set is unbounded state. The HLL
  * sketch IS mergeable (union is associative + commutative over the
  * underlying register maxima, so ANY batching yields the same final
  * sketch registers) at a fixed few-KB state per key — the only shape
  * that survives a 100 TB stream of daily deltas.
  *
  * Exactness contract: estimates carry the documented HLL error
  * (~1.04/√2^lgK rsd), and that BAND — asserted against an exact
  * recompute, the q72/q108 sketch-contract pattern (q165) — is the
  * mergeability contract: a union that dropped keys or double-counted
  * under batching would leave it. Do NOT assert register/estimate
  * equality between a sequentially-built sketch and a union of deltas:
  * DataSketches legitimately answers with the HIP estimator on the
  * former and the composite estimator on the latter, a documented
  * ~1% divergence, and coupon-mode (small-delta) unions promote to
  * dense registers on a different path again. */
object IncrementalDistinct {

  /** Per-key sketch state of `valueCol`: (keys…, nd_sketch BINARY). */
  def state(df: DataFrame, keys: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame = {
    require(keys.nonEmpty, "at least one key required")
    require(!keys.contains("nd_sketch"), "nd_sketch is reserved")
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("nd_sketch"))
  }

  /** Merge sketch states: one union re-aggregate; keys are every
    * non-sketch column. */
  def merge(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "at least one state required")
    val keys = states.head.columns.filterNot(_ == "nd_sketch").toSeq
    states.foreach(s => require(s.columns.toSeq == states.head.columns.toSeq,
      "all states must share one schema"))
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("nd_sketch")).as("nd_sketch"))
  }

  /** Read the estimate off a state frame: replaces `nd_sketch` with
    * `n_distinct_est`. */
  def estimate(state: DataFrame): DataFrame =
    state.withColumn("n_distinct_est",
        hll_sketch_estimate(col("nd_sketch")).cast("long"))
      .drop("nd_sketch")
}
