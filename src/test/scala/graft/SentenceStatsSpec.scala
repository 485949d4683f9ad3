package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sentence segmentation contract ([[TextFunctions.sentences]]) and the
  * q237 sentence-shape statistics built on it. */
class SentenceStatsSpec extends SparkSpec {
  import spark.implicits._

  private def segs(s: String): Seq[String] =
    Seq(s).toDF("text")
      .select(TextFunctions.sentences($"text").as("s"))
      .head().getSeq[String](0)

  test("splits on terminal punctuation runs, trims, drops empties") {
    assert(segs("Hello world. Foo bar! Baz?") ===
      Seq("Hello world", "Foo bar", "Baz"))
    // runs collapse to one break; interior spaces around breaks trimmed
    assert(segs("a!!  b ...c") === Seq("a", "b", "c"))
  }

  test("text without terminal punctuation is one sentence") {
    assert(segs("no punctuation here at all") ===
      Seq("no punctuation here at all"))
  }

  test("punctuation-only and empty text segment to zero sentences") {
    assert(segs("...!?") === Seq.empty)
    assert(segs("") === Seq.empty)
    assert(segs("   ") === Seq.empty)
  }

  test("sentenceCount and sentenceLens agree with the segments") {
    val row = Seq("One two. Three! ?").toDF("text")
      .select(TextFunctions.sentenceCount($"text").as("n"),
        TextFunctions.sentenceLens($"text").as("lens"))
      .head()
    assert(row.getInt(0) === 2)
    assert(row.getSeq[Long](1) === Seq(7L, 5L))
  }

  test("q237 invariants hold on the fixture corpus") {
    val out = SparkEntry.queries("q237_sentence_stats")(spark, sfDir).cache()
    try {
      assert(out.count() > 0)
      // per-row shape invariants: extremes bracket the mass, zero-sentence
      // docs report all-zero stats
      val bad = out.filter(
        ($"n_sentences" > 0 && ($"min_sentence_chars" > $"max_sentence_chars" ||
          $"n_sentence_chars" < $"max_sentence_chars" ||
          $"n_sentence_chars" > $"n_sentences" * $"max_sentence_chars" ||
          $"min_sentence_chars" <= 0)) ||
        ($"n_sentences" === 0 && ($"n_sentence_chars" =!= 0 ||
          $"min_sentence_chars" =!= 0 || $"max_sentence_chars" =!= 0)))
      assert(bad.count() === 0)
      // the synthesized breaks actually segment: some doc has >1 sentence
      assert(out.filter($"n_sentences" > 1).count() > 0)
    } finally out.unpersist()
  }

  test("segmentation matches a driver-side reference on random strings") {
    val rnd = new scala.util.Random(47)
    val alphabet = "ab .!?  cd?? e.g  "
    val strs = (1 to 200).map { _ =>
      (1 to rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString
    }
    def ref(s: String): Seq[String] =
      s.split("[.!?]+", -1).map(_.trim).filter(_.nonEmpty).toSeq
    val got = strs.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("i", "text")
      .select($"i", TextFunctions.sentences($"text").as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    strs.zipWithIndex.foreach { case (s, i) =>
      assert(got(i) === ref(s), s"input ${s.map(_.toInt)}")
    }
  }

  test("syllables match a driver-side reference on random token strings") {
    val rnd = new scala.util.Random(53)
    val words = Seq("spark", "merge", "xyz", "aeiou", "rhythm", "b", "",
      "queueing", "mmm", "yyy")
    val strs = (1 to 100).map { _ =>
      (1 to 1 + rnd.nextInt(8)).map(_ => words(rnd.nextInt(words.length)))
        .mkString(" ")
    }
    def refSyl(s: String): Long =
      s.toLowerCase.split(" ", -1).map { w =>
        math.max("[aeiouy]+".r.findAllIn(w).length, 1).toLong
      }.sum
    val got = strs.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("i", "text")
      .select($"i", TextFunctions.syllableCount($"text").as("y"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    strs.zipWithIndex.foreach { case (s, i) =>
      assert(got(i) === refSyl(s), s"input '$s'")
    }
  }

  test("segmentation is invariant to input partitioning") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val a = docs.select($"doc_id",
        TextFunctions.sentenceCount(regexp_replace($"text", "\\b(the|a)\\b", "."))
          .as("n"))
    val b = docs.repartition(7).select($"doc_id",
        TextFunctions.sentenceCount(regexp_replace($"text", "\\b(the|a)\\b", "."))
          .as("n"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
