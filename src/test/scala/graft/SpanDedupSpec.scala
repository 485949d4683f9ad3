package graft

import org.apache.spark.sql.functions._

import graft.operators.SpanDedup

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Independent brute force: string shingles (no hashing), set counting,
    * then interval merge — a different algorithm end to end. */
  private def bruteSpans(docs: Seq[(Long, String)], w: Int,
      minCount: Int = 2): Set[(Long, Long, Long)] = {
    val sh = docs.flatMap { case (id, t) =>
      val ts = t.split(" ", -1)
      (0 to ts.length - w).map(i => (id, i + 1, ts.slice(i, i + w).mkString(" ")))
    }
    val counts = sh.groupBy(_._3).view.mapValues(_.size).toMap
    val cov = sh.filter(s => counts(s._3) >= minCount)
      .map(s => (s._1, s._2, s._2 + w - 1))
    cov.groupBy(_._1).flatMap { case (id, ivs) =>
      val sorted = ivs.map(iv => (iv._2, iv._3)).sortBy(_._1)
      val merged = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      for ((s, e) <- sorted) {
        if (merged.nonEmpty && s <= merged.last._2 + 1) {
          val (ps, pe) = merged.last
          merged(merged.size - 1) = (ps, math.max(pe, e))
        } else merged += ((s, e))
      }
      merged.map { case (s, e) => (id, s.toLong, e.toLong) }
    }.toSet
  }

  private val fixture = Seq(
    // docs 1 and 2 share an 8-token sentence mid-document
    (1L, "alpha beta gamma the quick brown fox jumps over the lazy dog tail one two"),
    (2L, "zero the quick brown fox jumps over the lazy dog omega psi chi phi"),
    // doc 3 repeats its own 8-gram back to back (intra-doc repetition,
    // adjacent spans must merge into one island)
    (3L, "a b c d e f g h a b c d e f g h trailing words here now"),
    // doc 4 shares nothing
    (4L, "unrelated content entirely distinct vocabulary without any overlap present today"),
    // doc 5 shorter than the shingle width
    (5L, "tiny doc"))

  test("repeatedSpans equals the brute-force string-shingle definition") {
    val df = fixture.toDF("doc_id", "text")
    val got = SpanDedup.repeatedSpans(df, "doc_id", "text", w = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === bruteSpans(fixture, 8))
    assert(got.exists(_._1 == 3L), "intra-doc repetition must be detected")
    // doc 3: shingles at pos 1..9 all repeated pairwise? positions 1 and 9
    // share the same 8-gram; the island must span the full 16 tokens
    assert(got.filter(_._1 == 3L) === Set((3L, 1L, 16L)))
    assert(!got.exists(_._1 == 4L) && !got.exists(_._1 == 5L))
  }

  test("rewrite drops exactly the covered tokens and keeps order") {
    val df = fixture.toDF("doc_id", "text")
    val out = SpanDedup.removeRepeatedSpans(df, "doc_id", "text", w = 8)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(out.length === fixture.length, "one row per input doc")
    val byId = out.map(r => r._1 -> r).toMap
    val spans = bruteSpans(fixture, 8)
    for ((id, text) <- fixture) {
      val ts = text.split(" ", -1)
      val coveredPos = spans.filter(_._1 == id)
        .flatMap(s => s._2 to s._3).map(_.toInt)
      val expect = ts.zipWithIndex
        .collect { case (t, i) if !coveredPos.contains(i + 1) => t }
        .mkString(" ")
      assert(byId(id)._2 === expect, s"doc $id text")
      assert(byId(id)._3 === ts.length.toLong, s"doc $id n_tokens")
      assert(byId(id)._4 === coveredPos.size.toLong, s"doc $id n_dropped")
    }
  }

  test("lossless on 200 generated docs with planted cross-doc spans") {
    // 150 base docs of hash words + 50 docs that embed a common 10-token
    // passage at varying offsets — declarative, deterministic
    val mkWords = (seed: String, n: Int) =>
      (1 to n).map(i => s"w${seed}_$i").mkString(" ")
    val passage = "shared passage tokens that repeat across many documents verbatim"
    val docs = (1 to 150).map(i => (i.toLong, mkWords(i.toString, 20))) ++
      (151 to 200).map { i =>
        val pre = mkWords(s"p$i", i % 7)
        val post = mkWords(s"q$i", 5)
        (i.toLong, s"$pre $passage $post".trim.replaceAll(" +", " "))
      }
    val got = SpanDedup.repeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", w = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === bruteSpans(docs, 8))
    assert(got.size >= 50, "every planted doc carries a span")
  }

  test("minCount above the occurrence count suppresses spans") {
    val df = fixture.toDF("doc_id", "text")
    val got = SpanDedup.repeatedSpans(df, "doc_id", "text", w = 8, minCount = 3L)
      .as[(Long, Long, Long)].collect().toSet
    // the shared sentence occurs twice, doc 3's self-repeat twice — all
    // below a min count of 3
    assert(got.isEmpty)
  }

  test("no token text in any exchange key: hash/id/pos only") {
    val df = fixture.toDF("doc_id", "text")
    for (plan <- Seq(
        SpanDedup.repeatedSpans(df, "doc_id", "text", w = 8),
        SpanDedup.removeRepeatedSpans(df, "doc_id", "text", w = 8))
        .map(_.queryExecution.executedPlan.toString)) {
      val parts = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toList
      parts.foreach { p =>
        assert(!p.contains("__ts#") && !p.contains("__tok#") && !p.contains("text#"),
          s"token text used as a partitioning key: $p")
      }
    }
  }
  test("null text reads as empty: rewrite keeps one row per doc, spans skip it") {
    val withNull = Seq((1L, "a b c d e f g h i"), (2L, null: String),
      (3L, "a b c d e f g h i")).toDF("doc_id", "text")
    val spans = SpanDedup.repeatedSpans(withNull, "doc_id", "text", w = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(spans.map(_._1) === Set(1L, 3L))
    val out = SpanDedup.removeRepeatedSpans(withNull, "doc_id", "text", w = 8)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out.length === 3, "null-text doc must not vanish")
    assert(out(1)._2 === "" && out(1)._4 === 0L)
  }
}
