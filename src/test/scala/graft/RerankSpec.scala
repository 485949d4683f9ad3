package graft

import org.apache.spark.sql.functions._

import graft.operators.{ProductQuantizer, Rerank}

/** Two-stage retrieval: exact re-rank of a bounded shortlist.
  * Saturated-shortlist ≡ brute force, membership containment, and the
  * broadcast (never corpus-shuffle) plan shape. */
class RerankSpec extends SparkSpec {
  import spark.implicits._

  private def noise(tag: String, i: Int, d: Int, amp: Double): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$tag:$i:$d".getBytes("UTF-8"))
    (((h(0) & 0xff) * 256 + (h(1) & 0xff)).toDouble / 65535.0 * 2 - 1) * amp
  }
  private val dim = 8
  private def vec(i: Int): Array[Double] =
    Array.tabulate(dim)(d => (i % 5).toDouble + noise("rr", i, d, 0.3))
  private lazy val corpus = (0 until 60)
    .map(i => (i.toLong, vec(i).toSeq)).toDF("vec_id", "embedding")
  private lazy val queries = corpus.filter($"vec_id" < 3)

  private def bruteTopK(qid: Long, k: Int): Seq[(Long, Double)] = {
    val qv = vec(qid.toInt)
    (0 until 60).map { i =>
      val d = vec(i).zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
      (i.toLong, BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (i, d) => (d, i) }.take(k)
  }

  test("saturated shortlist (all pairs) reproduces brute-force exact top-k") {
    val all = queries.select($"vec_id".as("query_id"))
      .crossJoin(corpus.select($"vec_id".as("id")))
    val got = Rerank.exactL2TopK(all, queries, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 4)
      .select($"query_id", $"rank", $"id", $"dist")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq)
    for (q <- 0L until 3L)
      assert(got(q) === bruteTopK(q, 4), s"query $q diverged from brute force")
  }

  test("re-rank only surfaces shortlist members, exactly ordered") {
    // shortlist = a fixed arbitrary 6 ids per query; the re-rank must
    // return exactly the best 3 OF THOSE, in exact-distance order
    val ids = Seq(7L, 11L, 20L, 33L, 41L, 55L)
    val shortlist = queries.select($"vec_id".as("query_id"))
      .crossJoin(ids.toDF("id"))
    val got = Rerank.exactL2TopK(shortlist, queries, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 3)
      .select($"query_id", $"id", $"dist")
      .as[(Long, Long, Double)].collect()
    assert(got.forall(r => ids.contains(r._2)), "non-shortlist id surfaced")
    for (q <- 0L until 3L) {
      val want = bruteTopK(q, 60).filter(r => ids.contains(r._1)).take(3)
      val g = got.filter(_._1 == q).sortBy(_._3).map(r => (r._2, r._3)).toSeq
      assert(g.toSet === want.toSet, s"query $q shortlist re-rank wrong")
    }
  }

  test("two-stage chain: ADC shortlist -> exact re-rank finds the true " +
      "top-k the shortlist contains; plan broadcasts the shortlist") {
    val model = ProductQuantizer.fit(corpus, "vec_id", "embedding",
      m = 2, k = 4, iters = 2)
    val codes = ProductQuantizer.encode(corpus, "vec_id", "embedding", model)
    val shortlist = ProductQuantizer.adcTopK(queries, "vec_id", "embedding",
        codes, "vec_id", model, k = 20)
      .select($"query_id", $"id")
    val reranked = Rerank.exactL2TopK(shortlist, queries, "vec_id",
      "embedding", corpus, "vec_id", "embedding", k = 3)
    val plan = reranked.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the shortlist gather must be a broadcast join:\n" + plan.take(2000))
    val got = reranked.select($"query_id", $"id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val short = shortlist.as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    for (q <- 0L until 3L) {
      val reachable = bruteTopK(q, 60).filter(r => short(q).contains(r._1))
        .take(3).map(_._1).toSet
      assert(got(q) === reachable, s"query $q: re-rank missed reachable best")
    }
  }

  test("validation: k >= 1") {
    intercept[IllegalArgumentException] {
      Rerank.exactL2TopK(queries.select($"vec_id".as("query_id"),
          $"vec_id".as("id")), queries, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 0)
    }
  }
}
