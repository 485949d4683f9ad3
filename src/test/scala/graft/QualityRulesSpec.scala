package graft

import graft.operators.QualityRules

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))

  test("each Gopher gate trips independently; a prose-like doc passes all") {
    val pass = Seq.fill(24)(Seq("the", "word")).flatten ++ Seq("a", "be") // 50 words
    val tooShort = Seq("the", "a", "short", "doc")
    val tinyWords = Seq.fill(50)("a")                       // mean len 1 < 3
    val longWords = Seq("the", "a") ++ Seq.fill(48)("x" * 11) // mean len > 10
    val numeric = Seq("the", "a") ++ Seq.fill(24)("123") ++ Seq.fill(24)("word") // alpha 52%
    val noStops = Seq.fill(50)("word")
    val docs = Seq(doc(1, pass), doc(2, tooShort), doc(3, tinyWords),
      doc(4, longWords), doc(5, numeric), doc(6, noStops)).toDF("doc_id", "text")
    val flags = QualityRules.annotate(docs, "text")
      .select($"doc_id", $"gopher_pass").as[(Long, Boolean)].collect().toMap
    assert(flags === Map(1L -> true, 2L -> false, 3L -> false,
      4L -> false, 5L -> false, 6L -> false))
    // survivors keep the original schema
    val kept = QualityRules(docs, "text")
    assert(kept.columns.toSeq === Seq("doc_id", "text"))
    assert(kept.select($"doc_id").as[Long].collect().toSeq === Seq(1L))
  }

  test("mean-word-length bounds are inclusive (integer cross-multiplication)") {
    // 50 words of exactly 3 chars: sum = 150 = 3 * n -> inclusive pass
    val exact3 = Seq("the", "and") ++ Seq.fill(48)("abc")
    // 50 words of exactly 10 chars plus stopword padding to stay at bound:
    // use 48 ten-char words + "the"(3) + 7-char word -> sum = 490 = 9.8n; and
    // a true boundary: 50 words summing to exactly 10n
    val exact10 = Seq("the" + "x" * 7, "and" + "x" * 7) ++ Seq.fill(48)("y" * 10)
    val docs = Seq(doc(1, exact3), doc(2, exact10)).toDF("doc_id", "text")
    val out = QualityRules.annotate(docs, "text")
      .select($"doc_id", $"sum_word_len", $"n_words", $"gopher_pass")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out(0)._2 === 3 * out(0)._3)
    assert(out(0)._4 === true, "sum == 3n must pass (lower bound inclusive)")
    assert(out(1)._2 === 10 * out(1)._3)
    // exact10 has no stopwords ("thexxxxxxx" is not "the") except none -> check
    // only the length gate via a config with minStopwords = 0
    val relaxed = QualityRules.annotate(docs, "text",
        QualityRules.Config(minStopwords = 0))
      .select($"doc_id", $"gopher_pass").as[(Long, Boolean)].collect().toMap
    assert(relaxed(2L) === true, "sum == 10n must pass (upper bound inclusive)")
  }

  test("annotation is a narrow map: no exchange") {
    val docs = core.Tables.documents(spark, sfDir)
    val plan = QualityRules.annotate(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }
  test("apply is a pure filter: pre-existing annotation columns keep their values") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, Seq.fill(20)("the quick brown foxes jump over lazy dogs").mkString(" "), 999L),
      (2L, "zz", 999L)).toDF("doc_id", "text", "n_words")
    val out = QualityRules.apply(docs, "text")
    assert(out.columns.toSeq === docs.columns.toSeq)
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(1L))
    assert(out.select("n_words").as[Long].collect().toSeq === Seq(999L),
      "caller's own n_words column must survive untouched")
  }
}
