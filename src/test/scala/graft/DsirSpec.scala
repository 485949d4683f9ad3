package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dsir, Sampling}

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target: "alpha"-heavy; raw adds "zeta"-heavy noise docs
  private lazy val target = Seq(
    (100L, "alpha beta alpha"),
    (101L, "alpha gamma")).toDF("doc_id", "text")
  private lazy val raw = Seq(
    (1L, "alpha beta"),      // target-like
    (2L, "zeta zeta eta"),   // off-target
    (3L, "alpha zeta")).toDF("doc_id", "text")

  test("weights match the textbook add-k computation on a hand corpus") {
    val m = Dsir.fit(target, raw, "text", addK = 0.5)
    try {
      // raw vocab {alpha,beta,zeta,eta} = 4; nT = 5 (target tokens), nR = 7
      assert(m.vocabSize === 4 && m.nTarget === 5L && m.nRaw === 7L)
      val w = Dsir.weigh(raw, "doc_id", "text", m)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      def pT(c: Long) = (c + 0.5) / (5 + 0.5 * 4)
      def pR(c: Long) = (c + 0.5) / (7 + 0.5 * 4)
      def lp(ct: Long, cr: Long) =
        BigDecimal(math.log(pT(ct)) - math.log(pR(cr)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      // target counts: alpha=3, beta=1, gamma=1; raw: alpha=2, beta=1, zeta=3, eta=1
      val expected1 = lp(3, 2) + lp(1, 1)          // alpha beta
      val expected2 = lp(0, 3) * 2 + lp(0, 1)      // zeta zeta eta
      assert(w(1L)._1 === 2L)
      assert(math.abs(w(1L)._2 - expected1) < 1e-9, s"got ${w(1L)._2}, want $expected1")
      assert(math.abs(w(2L)._2 - expected2) < 1e-9, s"got ${w(2L)._2}, want $expected2")
      assert(w(1L)._2 > 0, "target-like doc weighs positive")
      assert(w(2L)._2 < 0, "off-target doc weighs negative")
    } finally spark.catalog.clearCache()
  }

  test("selection composes with topFractionByScore: target-like docs survive") {
    val weighted = Dsir.weighAgainst(raw, target, "doc_id", "text")
      .withColumn("avg_ratio", $"sum_logratio" / $"n_tokens")
      .withColumn("stratum", lit("all"))
    try {
      val kept = Sampling.topFractionByScore(
          weighted, "doc_id", "avg_ratio", "stratum", fraction = 1.0 / 3.0)
        .select($"doc_id").as[Long].collect().toSet
      assert(kept === Set(1L), s"the most target-like doc wins: $kept")
    } finally spark.catalog.clearCache()
  }

  test("weigh: no document text in any exchange key (hashed tokens only)") {
    val m = Dsir.fit(target, raw, "text")
    try {
      val plan = Dsir.weigh(raw, "doc_id", "text", m)
        .queryExecution.executedPlan.toString
      "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).foreach { p =>
        assert(!p.contains("text#"), s"document text used as a partitioning key: $p")
      }
    } finally spark.catalog.clearCache()
  }

  test("weights are invariant to partitioning (exact-decimal sum)") {
    val big = (0 until 200).map(i =>
      (i.toLong, if (i % 3 == 0) "alpha beta gamma" else "zeta eta theta alpha"))
      .toDF("doc_id", "text")
    val m = Dsir.fit(target, big, "text")
    try {
      val a = Dsir.weigh(big.repartition(1), "doc_id", "text", m)
        .orderBy($"doc_id").collect().map(_.toString).toSeq
      val b = Dsir.weigh(big.repartition(13), "doc_id", "text", m)
        .orderBy($"doc_id").collect().map(_.toString).toSeq
      assert(a === b)
    } finally spark.catalog.clearCache()
  }
}
