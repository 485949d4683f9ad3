package graft

import org.apache.spark.sql.functions._
import graft.operators.RankMetrics

/** [[graft.operators.RankMetrics]]: the quantized discount table and the
  * integer gate arithmetic, pinned against hand-computed values — the
  * fixture is chosen so the mean-nDCG gate lands EXACTLY on its floor
  * (subset-sum total == IDCG), proving the ≥ comparisons are exact
  * integer arithmetic with no float wobble at the boundary. */
class RankMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("dcgWeightsScaled: hand-computed 1e9-grid discounts") {
    val w = RankMetrics.dcgWeightsScaled(3)
    // 1/log2(2) = 1 and 1/log2(4) = 1/2 are exact; 1/log2(3) =
    // 0.6309297535714574... floors to 630929753 on the 1e9 grid
    assert(w.toSeq === Seq(1000000000L, 630929753L, 500000000L))
    assert(RankMetrics.dcgWeightsScaled(1).toSeq === Seq(1000000000L))
  }

  // 2 queries, k = 3. ann: q1 hits a@1 and b@3 (miss at 2), q2 hits
  // e@2 only. DCG(q1) = w1 + w3 = 1.5e9, DCG(q2) = w2 = 630929753;
  // total = 2130929753 = IDCG exactly, so mean nDCG is EXACTLY 50 % of
  // the 2-query ideal. First hits at ranks 1 and 2 give mean MRR 75 %.
  private def fixture = {
    val ann = Seq(
      (1L, "a", 1L), (1L, "x", 2L), (1L, "b", 3L),
      (2L, "y", 1L), (2L, "e", 2L), (2L, "z", 3L))
      .toDF("query_id", "id", "rank")
    val ref = Seq((1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "d"), (2L, "e"), (2L, "f")).toDF("query_id", "id")
    (ann, ref)
  }

  private def row(minH: Int, meanP: Int, ndcgP: Int, mrrP: Int) = {
    val (ann, ref) = fixture
    RankMetrics.gateRow("v", ann, ref, "query_id", "id", "rank", k = 3,
        minH, meanP, ndcgP, mrrP)
      .select($"n_queries", $"pass_min", $"pass_mean", $"pass_ndcg",
        $"pass_mrr")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].head()
  }

  test("gates pass AT their exact boundaries and fail one percent above") {
    // recall: hits 2 + 1 = 3 of 6 → mean exactly 50 %; min hits = 1
    // nDCG: total DCG == IDCG over 2 queries → exactly 50 %
    // MRR: (1e9 + 5e8) / 2e9 → exactly 75 %
    assert(row(1, 50, 50, 75) === ((2L, true, true, true, true)))
    assert(row(2, 50, 50, 75)._2 === false, "min-hits floor above q2's 1 hit")
    assert(row(1, 51, 50, 75)._3 === false, "mean recall is exactly 50%")
    assert(row(1, 50, 51, 75)._4 === false, "mean nDCG is exactly 50%")
    assert(row(1, 50, 50, 76)._5 === false, "mean MRR is exactly 75%")
  }

  test("a query with zero hits stays in the denominator and fails min-hits") {
    val ann = Seq((1L, "a", 1L)).toDF("query_id", "id", "rank")
    val ref = Seq((1L, "a"), (2L, "d")).toDF("query_id", "id")
    val r = RankMetrics.gateRow("v", ann, ref, "query_id", "id", "rank",
        k = 1, minHitsFloor = 1, meanPctFloor = 50, ndcgPctFloor = 50,
        mrrPctFloor = 50)
      .select($"n_queries", $"pass_min", $"pass_mean", $"pass_ndcg",
        $"pass_mrr")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].head()
    assert(r === ((2L, false, true, true, true)),
      "q2 must count in n_queries and break the min-hits floor")
  }

  test("a query with fewer than k relevant ids can still reach 100 %") {
    // k = 3 but q1 has ONE relevant id, found at rank 1: per-query
    // denominators (c_q = min(|ref_q|, k) = 1) make recall, nDCG and
    // the capped min-hits floor all perfect; the old k-denominators
    // would have pinned mean recall at 33 % forever
    val ann = Seq((1L, "a", 1L), (1L, "x", 2L), (1L, "y", 3L))
      .toDF("query_id", "id", "rank")
    val ref = Seq((1L, "a")).toDF("query_id", "id")
    val r = RankMetrics.gateRow("v", ann, ref, "query_id", "id", "rank",
        k = 3, minHitsFloor = 3, meanPctFloor = 100, ndcgPctFloor = 100,
        mrrPctFloor = 100)
      .select($"pass_min", $"pass_mean", $"pass_ndcg", $"pass_mrr")
      .as[(Boolean, Boolean, Boolean, Boolean)].head()
    assert(r === ((true, true, true, true)))
  }

  test("a containment pool larger than k keeps the /k denominator") {
    // ref is a 5-id pool, k = 2 selections both inside it: containment
    // is 2/min(5,2) = 100 %, not 2/5 — the q214 MMR gate shape
    val ann = Seq((1L, "a", 1L), (1L, "b", 2L)).toDF("query_id", "id", "rank")
    val ref = Seq((1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"), (1L, "e"))
      .toDF("query_id", "id")
    val r = RankMetrics.gateRow("v", ann, ref, "query_id", "id", "rank",
        k = 2, minHitsFloor = 2, meanPctFloor = 100, ndcgPctFloor = 100,
        mrrPctFloor = 100)
      .select($"pass_min", $"pass_mean", $"pass_ndcg", $"pass_mrr")
      .as[(Boolean, Boolean, Boolean, Boolean)].head()
    assert(r === ((true, true, true, true)))
  }

  test("floor 0 disables a gate (always true, even with zero hits anywhere)") {
    val ann = Seq((1L, "z", 1L)).toDF("query_id", "id", "rank")
    val ref = Seq((1L, "a")).toDF("query_id", "id")
    val r = RankMetrics.gateRow("v", ann, ref, "query_id", "id", "rank",
        k = 1, minHitsFloor = 0, meanPctFloor = 0, ndcgPctFloor = 0,
        mrrPctFloor = 0)
      .select($"pass_min", $"pass_mean", $"pass_ndcg", $"pass_mrr")
      .as[(Boolean, Boolean, Boolean, Boolean)].head()
    assert(r === ((true, true, true, true)))
  }
}
