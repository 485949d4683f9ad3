package graft

import graft.core.Tables
import graft.functions.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // The classic BPE corpus (Sennrich et al.): word frequencies
  // low:5 lower:2 newest:6 widest:3
  private def classic = Seq(
    Seq.fill(5)("low"), Seq.fill(2)("lower"),
    Seq.fill(6)("newest"), Seq.fill(3)("widest"))
    .flatten.mkString(" ")

  test("fit reproduces the textbook merge sequence on the classic corpus") {
    val docs = Seq(classic).toDF("text")
    val model = Bpe.fit(docs, "text", nMerges = 4)
    // (e,s) count 9 (newest+widest), then (es,t) 9, then (est,</w>) 9,
    // then (l,o) 7 (low+lower)
    assert(model.merges.take(4) === Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")))
  }

  test("encode applies merges greedily by rank; unseen words fall to chars") {
    val docs = Seq(classic).toDF("text")
    val model = Bpe.fit(docs, "text", nMerges = 10)
    val newest = model.encodeWord("newest")
    assert(newest.last.endsWith(Bpe.EOW))
    assert(newest.contains("est</w>") || newest.exists(_.endsWith("est</w>")),
      s"newest -> $newest")
    assert(newest.mkString === "newest" + Bpe.EOW, "pieces concatenate to the word")
    // a word sharing no learned pair splits to characters
    val zq = model.encodeWord("zq")
    assert(zq === Seq("z", "q", Bpe.EOW))
    // more merges never increase the piece count of any word
    val small = Bpe.fit(docs, "text", nMerges = 2)
    for (w <- Seq("newest", "widest", "lower", "low"))
      assert(model.encodeWord(w).length <= small.encodeWord(w).length)
  }

  test("tokenCount column: consistent with driver-side encoding, fewer than chars") {
    val docs = Tables.documents(spark, sfDir).limit(60).cache()
    val model = Bpe.fit(docs, "text", nMerges = 200, maxWords = 5000)
    val counted = model.tokenCount(docs, "text").cache()
    val rows = counted.select($"doc_id", $"text", $"bpe_tokens")
      .as[(Long, String, Int)].collect()
    rows.foreach { case (_, text, n) =>
      val expected = model.encode(text).length
      assert(n === expected)
      val words = text.split(" ").count(_.nonEmpty)
      assert(n >= words, "at least one piece per word")
    }
    // determinism across partitionings
    val model2 = Bpe.fit(docs.repartition(7), "text", nMerges = 200, maxWords = 5000)
    assert(model2.merges === model.merges)
  }
}
