package graft

import org.apache.spark.sql.functions._

import graft.operators.QuantizedLR

/** Quantized-gradient hard-sigmoid logistic regression: partition-order
  * invariance (the bit-reproducibility contract), learning direction on
  * separable data, score bounds, and the loud-failure guards. */
class QuantizedLRSpec extends SparkSpec {
  import spark.implicits._

  // separable fixture: y = 1 iff x1 > 1.0; x2 is noise-ish but exact
  private def row(i: Int): (Long, Double, Double, Double) = {
    val x1 = (i % 40) / 10.0            // 0.0 .. 3.9 on an exact-ish grid
    val x2 = ((i * 7) % 10) / 10.0
    (i.toLong, x1, x2, if (x1 > 1.0) 1.0 else 0.0)
  }
  private lazy val data = (0 until 400).map(row)
    .toDF("id", "x1", "x2", "y")

  test("fit is bit-identical under repartitioning and row order") {
    val w1 = QuantizedLR.fit(data, Seq("x1", "x2"), "y", lr = 0.2, rounds = 4)
    val w2 = QuantizedLR.fit(data.repartition(13, $"x2").sortWithinPartitions($"x2"),
      Seq("x1", "x2"), "y", lr = 0.2, rounds = 4)
    val w3 = QuantizedLR.fit(data.orderBy($"id".desc).coalesce(1),
      Seq("x1", "x2"), "y", lr = 0.2, rounds = 4)
    assert(w1.toSeq === w2.toSeq, "weights drift under repartitioning")
    assert(w1.toSeq === w3.toSeq, "weights drift under row order")
  }

  test("training learns the separating direction; scores rank positives first") {
    val w = QuantizedLR.fit(data, Seq("x1", "x2"), "y", lr = 0.2, rounds = 6)
    assert(w(1) > 0.0, s"x1 weight should be positive, got ${w(1)}")
    val scored = data.withColumn("s", QuantizedLR.scoreCol(Seq("x1", "x2"), w))
    val Array(posMean, negMean) = scored
      .agg(avg(when($"y" === 1.0, $"s")), avg(when($"y" === 0.0, $"s")))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    assert(posMean > negMean + 0.05,
      s"positives must score above negatives: $posMean vs $negMean")
    // scores stay in [0, 1] (hard-sigmoid clamp)
    val Array(mn, mx) = scored.agg(min($"s"), max($"s"))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    assert(mn >= 0.0 && mx <= 1.0, s"score out of [0,1]: [$mn, $mx]")
  }

  test("more rounds monotonically do not hurt separation on separable data") {
    def sep(rounds: Int): Double = {
      val w = QuantizedLR.fit(data, Seq("x1", "x2"), "y", lr = 0.2, rounds = rounds)
      val r = data.withColumn("s", QuantizedLR.scoreCol(Seq("x1", "x2"), w))
        .agg(avg(when($"y" === 1.0, $"s")) - avg(when($"y" === 0.0, $"s")))
        .collect().head.getDouble(0)
      r
    }
    assert(sep(6) >= sep(2) - 1e-9, "separation regressed with more rounds")
  }

  test("guards: null/NaN feature and non-binary label fail loudly; " +
      "empty frame and bad params rejected") {
    val nullFeat = Seq((1L, Some(1.0), 1.0), (2L, None, 0.0))
      .toDF("id", "x1", "y")
    val e1 = intercept[Exception] {
      QuantizedLR.fit(nullFeat, Seq("x1"), "y", lr = 0.1, rounds = 1) }
    assert(e1.getMessage.contains("QuantizedLR"))
    val badLabel = Seq((1L, 1.0, 2.0)).toDF("id", "x1", "y")
    val e2 = intercept[Exception] {
      QuantizedLR.fit(badLabel, Seq("x1"), "y", lr = 0.1, rounds = 1) }
    assert(e2.getMessage.contains("label"))
    intercept[IllegalArgumentException] {
      QuantizedLR.fit(data.limit(0), Seq("x1"), "y", lr = 0.1, rounds = 1) }
    intercept[IllegalArgumentException] {
      QuantizedLR.fit(data, Seq.empty, "y", lr = 0.1, rounds = 1) }
    intercept[IllegalArgumentException] {
      QuantizedLR.fit(data, Seq("x1"), "y", lr = 0.1, rounds = 0) }
    intercept[IllegalArgumentException] {
      QuantizedLR.fit(data, Seq("x1"), "y", lr = -1.0, rounds = 1) }
    intercept[IllegalArgumentException] {
      QuantizedLR.scoreCol(Seq("x1"), Array(0.0, 0.0, 0.0)) }
  }
}
