package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact, engine-replayable retrieval-quality gates over ranked result
  * frames: recall floors, graded nDCG@k, and MRR — the measurement half
  * of an ANN deployment (a variant without a measured floor is
  * "approximate by design" with no regression brake; q214 turns each
  * into a hash-gated boolean).
  *
  * All three metrics reduce to INTEGER arithmetic, so the gates are
  * bit-identical across engines and partitionings:
  *
  *  - recall: per-query hit counts against the reference set — already
  *    integers; the gate compares `100·Σ_q hits_q ≥ pct·Σ_q c_q` with
  *    c_q = min(|ref_q|, k), the standard recall@k denominator.
  *  - nDCG@k (binary relevance): the per-position discount weights
  *    1/log2(i+1) are k fixed constants, so each query's DCG is a
  *    subset-sum of them, and the mean-nDCG gate is
  *    `100·Σ_q DCG_q ≥ pct·Σ_q IDCG_q` with IDCG_q the sum of the
  *    first c_q weights. Quantizing the k weights ONCE,
  *    driver-side, to a 1e-9 grid (floor, the [[QuantizedLR]]
  *    discipline) makes every DCG_q an exact BIGINT subset-sum — the
  *    float-accumulation order problem is gone before the cluster ever
  *    sees a weight. k is small, so the 1e-9 quantization error
  *    (< k·1e-9 relative) cannot move any sane floor.
  *  - MRR: each query contributes floor(1e9 / first-relevant-rank) —
  *    exact integer division.
  *
  * Scale shape: one left-semi join of the ranked frame against the
  * reference (both already top-k-bounded per query), one per-query
  * aggregate, one global aggregate to a single gate row. Nothing
  * corpus-sized.
  */
object RankMetrics {

  /** floor(1e9 · 1/log2(i+1)) for i = 1..k — the quantized binary-nDCG
    * discount table. StrictMath keeps the constant bit-identical across
    * JVMs; it is evaluated once, driver-side, and shipped as literals. */
  def dcgWeightsScaled(k: Int): Array[Long] =
    Array.tabulate(k) { i =>
      math.floor(1e9 * StrictMath.log(2.0) / StrictMath.log(i + 2.0)).toLong
    }

  /** One gate row for a ranked `ann` frame — (queryIdCol, rankCol 1..k,
    * idCol) — against the reference relevant set `ref` (queryIdCol,
    * idCol). Floors are percentages (0 disables a gate — it
    * degenerates to `≥ 0`, always true; use for variants where the
    * metric is meaningless, e.g. nDCG of a diversification re-ranker
    * that trades relevance by design).
    *
    * Denominators are PER-QUERY, the standard @k definitions: each
    * query's effective relevant count is c_q = min(|ref_q|, k), so
    * mean recall is Σhits / Σc_q, per-query IDCG is the sum of the
    * first c_q discount weights, and the min-hits floor caps at c_q —
    * a query with fewer than k relevant ids (or more: a containment
    * pool larger than k) can still reach 100 %, instead of floors
    * silently tightening (|ref_q| < k) or loosening (|ref_q| > k)
    * against the nominal recall/nDCG definition.
    *
    * Output (one row): variant, n_queries, min_hits_floor,
    * mean_pct_floor, ndcg_pct_floor, mrr_pct_floor, pass_min,
    * pass_mean, pass_ndcg, pass_mrr — every value an integer or a
    * boolean over integers. Queries with zero hits count (via the
    * ref-side group-by), so an empty ANN answer fails floors rather
    * than vanishing. */
  def gateRow(variant: String, ann: DataFrame, ref: DataFrame,
      queryIdCol: String, idCol: String, rankCol: String, k: Int,
      minHitsFloor: Int, meanPctFloor: Int, ndcgPctFloor: Int,
      mrrPctFloor: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = dcgWeightsScaled(k)
    // cumulative discount sums: cum(i) = w(1)+…+w(i), so a query with
    // c_q relevant ids gets IDCG_q = element_at(cum, c_q) — still a
    // driver-side constant table, still exact BIGINT arithmetic
    val cum = w.scanLeft(0L)(_ + _).tail
    val rel = ann
      .select(col(queryIdCol).as("query_id"), col(idCol).as("id"),
        col(rankCol).cast("int").as("__r"))
      .join(ref.select(col(queryIdCol).as("query_id"), col(idCol).as("id")),
        Seq("query_id", "id"), "left_semi")
    val perQ = rel.groupBy(col("query_id")).agg(
      count(lit(1)).as("__h"),
      sum(element_at(lit(w), col("__r"))).as("__dcg"),
      (lit(1000000000L) / min(col("__r")).cast("long")).cast("long")
        .as("__rr"))
    // distinct BEFORE counting: relevance is a SET of (query, id) pairs,
    // and the hits side already dedups via the semi-join — a ref built
    // from a join that emits duplicate rows would otherwise inflate c_q
    // and IDCG_q, making 100% recall unreachable for a perfect answer
    ref.select(col(queryIdCol).as("query_id"), col(idCol).as("id"))
      .distinct()
      .groupBy(col("query_id"))
      .agg(least(count(lit(1)), lit(k.toLong)).as("__c"))
      .withColumn("__idcg", element_at(lit(cum), col("__c").cast("int")))
      .join(perQ, Seq("query_id"), "left")
      .agg(count(lit(1)).as("__nq"),
        min(coalesce(col("__h"), lit(0L)) -
          least(lit(minHitsFloor.toLong), col("__c"))).as("__mnslack"),
        sum(coalesce(col("__h"), lit(0L))).as("__tot"),
        sum(col("__c")).as("__totref"),
        sum(coalesce(col("__dcg"), lit(0L))).as("__dcg"),
        sum(col("__idcg")).as("__idcgsum"),
        sum(coalesce(col("__rr"), lit(0L))).as("__rr"))
      .select(lit(variant).as("variant"),
        col("__nq").as("n_queries"),
        lit(minHitsFloor.toLong).as("min_hits_floor"),
        lit(meanPctFloor.toLong).as("mean_pct_floor"),
        lit(ndcgPctFloor.toLong).as("ndcg_pct_floor"),
        lit(mrrPctFloor.toLong).as("mrr_pct_floor"),
        (col("__mnslack") >= 0).as("pass_min"),
        (col("__tot") * 100 >= lit(meanPctFloor.toLong) * col("__totref"))
          .as("pass_mean"),
        (col("__dcg") * 100 >= lit(ndcgPctFloor.toLong) *
          col("__idcgsum")).as("pass_ndcg"),
        (col("__rr") * 100 >= lit(mrrPctFloor.toLong) *
          lit(1000000000L) * col("__nq")).as("pass_mrr"))
  }
}
