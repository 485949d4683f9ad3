package graft

import graft.operators.NgramLm

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private lazy val reference = Seq(
    (1L, "a b a b"),
    (2L, "a c")).toDF("doc_id", "text")

  test("textbook add-k bigram probabilities on a hand-computed fixture") {
    // reference counts: unigrams a:3 b:2 c:1 (V=3); bigrams "a b":2 "b a":1 "a c":1
    val model = NgramLm.fit(reference, "text", addK = 0.5)
    assert(model.vocabSize === 3L)
    val got = NgramLm.score(Seq((10L, "a b c")).toDF("doc_id", "text"),
        "doc_id", "text", model)
      .select($"doc_id", $"n_bigrams", $"avg_logprob")
      .as[(Long, Long, Double)].collect().head
    assert(got._1 === 10L)
    assert(got._2 === 2L) // bigrams: "a b", "b c"
    val expected = (math.log(2.5 / 4.5) + math.log(0.5 / 3.5)) / 2
    // per-row decimal(scale 6) rounding before the exact sum -> <= 5e-7/term
    assert(math.abs(got._3 - expected) < 1e-5, s"got ${got._3}, want ~$expected")
  }

  test("reference-like text outscores out-of-vocabulary text; short docs drop") {
    val model = NgramLm.fit(reference, "text")
    val scores = NgramLm.score(Seq(
        (1L, "a b a c"),   // in-vocabulary
        (2L, "z q z q z"), // fully OOV
        (3L, "a")          // no bigram -> dropped
      ).toDF("doc_id", "text"), "doc_id", "text", model)
      .select($"doc_id", $"n_bigrams", $"avg_logprob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(scores.keySet === Set(1L, 2L))
    assert(scores(1L) > scores(2L),
      s"in-vocab ${scores(1L)} must beat OOV ${scores(2L)}")
  }

  test("score is partition-invariant (exact decimal aggregation)") {
    val docs = core.Tables.documents(spark, sfDir)
    val model = NgramLm.fit(docs.filter($"lang" === "en"), "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      NgramLm.score(d, "doc_id", "text", model)
        .select($"doc_id", $"n_bigrams", $"sum_logprob", $"avg_logprob")
        .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(run(docs) === run(docs.repartition(13)))
  }
}
