package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount counts whitespace tokens") {
    val df = Seq("one two three", "solo").toDF("text")
    assert(df.select(tokenCount($"text")).as[Int].collect().toSeq === Seq(3, 1))
  }

  test("fingerprint is invariant to token order and multiplicity") {
    val df = Seq(
      ("a", "spark fast join merge"),
      ("b", "merge join fast spark"),
      ("c", "spark spark fast join merge join"),
      ("d", "completely different words here")).toDF("id", "text")
    val fps = df.select($"id", fingerprint($"text").as("fp")).as[(String, String)]
      .collect().toMap
    assert(fps("a") === fps("b"))
    assert(fps("a") === fps("c"))
    assert(fps("a") !== fps("d"))
  }

  test("langId picks the language with most function-word hits") {
    val df = Seq(
      "the cat is of the house and it",
      "der hund ist nicht das problem und",
      "le chat et la maison est une",
      "xyzzy qwerty plugh").toDF("text")
    assert(df.select(langId($"text")).as[String].collect().toSeq ===
      Seq("en", "de", "fr", "und"))
  }

  test("langIdScript layers CJK detection over the stopword signal") {
    val df = Seq(
      "这是 一个 中文 文档 的 例子 有 很多 汉字",  // zh: script signal
      "the quick brown fox and the lazy dog",     // en: stopword signal
      "12345 67890 !!!").toDF("text")             // neither → und
    assert(df.select(langIdScript($"text")).as[String].collect().toSeq ===
      Seq("zh", "en", "und"))
  }

  test("shingleArray produces n-grams, distinct, empty when too short") {
    val df = Seq("a b c d", "a b").toDF("text")
    val got = df.select(shingleArray($"text", 3).as("sh")).as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)
  }

  test("qualityScore is bounded and ranks clean text above noise") {
    val df = Seq(
      ("clean", "the quick brown fox is one of the best examples in writing and it shows"),
      ("noise", "@@ ## !! ?? ;; :: ~~ ^^")).toDF("id", "text")
    val scores = df.select($"id", qualityScore($"text")).as[(String, Double)].collect().toMap
    assert(scores("clean") > scores("noise"))
    scores.values.foreach(s => assert(s >= 0.0 && s <= 1.0))
  }

  test("subwordCount splits digit/letter boundaries") {
    val df = Seq("abc123def 45x").toDF("text")
    // abc|123|def, 45|x -> 5 pieces
    assert(df.select(subwordCount($"text")).as[Int].head() === 5)
  }

  test("multiplicity_stats matches brute-force counting; gram_hashes keeps duplicates") {
    import graft.functions.expressions.ShingleHashes.{gram_hashes, shingle_hashes}
    import graft.functions.expressions.SketchExpressions.multiplicity_stats
    val texts = Seq(
      "a b a b a b",        // 2-grams: ab ba ab ba ab -> total 5, distinct 2, max 3
      "x y z",              // total 2, distinct 2, max 1
      "w",                  // no 2-gram
      "r r r r")            // rr rr rr -> total 3, distinct 1, max 3
    val df = texts.toDF("text")
    val got = df.select(multiplicity_stats(gram_hashes(tokens($"text"), 2)))
      .as[Seq[Long]].collect().map(_.toList).toList
    assert(got === List(List(5, 2, 3), List(2, 2, 1), List(0, 0, 0), List(3, 1, 3)))
    // distinct shingle_hashes would erase the signal — pin the difference
    val distinctStats = df.limit(1)
      .select(multiplicity_stats(shingle_hashes(tokens($"text"), 2)))
      .as[Seq[Long]].head()
    assert(distinctStats === Seq(2, 2, 1))
    // random cross-check vs brute-force grouping, n = 3
    val rnd = new scala.util.Random(7)
    val randomTexts = Seq.fill(30)(Seq.fill(rnd.nextInt(30))(
      ('a' + rnd.nextInt(3)).toChar.toString).mkString(" ")).toDF("text")
    val viaKernel = randomTexts
      .select(multiplicity_stats(gram_hashes(tokens($"text"), 3)))
      .as[Seq[Long]].collect().map(_.toList)
    val brute = randomTexts.as[String].collect().map { t =>
      val toks = t.split(" ").filter(_.nonEmpty)
      val grams = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      if (grams.isEmpty) List(0L, 0L, 0L)
      else {
        val c = grams.groupBy(identity).map(_._2.size)
        List(grams.size.toLong, c.size.toLong, c.max.toLong)
      }
    }.toList
    assert(viaKernel.toList === brute)
  }

  test("normalizeText: NFC composes, singletons map, case folds, whitespace collapses") {
    import graft.functions.TextFunctions.normalizeText
    val rows = Seq(
      "Café",          // NFD e + combining acute -> café
      "Å ANGSTROM",     // angstrom sign singleton -> å via NFC+lower
      "  A\t\tB   C \n D ",  // runs of mixed whitespace
      "café",           // already normalized: fixpoint
      "")
      .toDF("t").select(normalizeText($"t")).as[String].collect().toSeq
    assert(rows === Seq("café", "å angstrom", "a b c d", "café", ""))
    // idempotence: normalize twice == normalize once, across real docs
    import graft.core.Tables
    val docs = Tables.documents(spark, sfDir)
    val diff = docs.filter(
      normalizeText(normalizeText($"text")) =!= normalizeText($"text")).count()
    assert(diff === 0L)
    // null passes through
    val n = Seq[Option[String]](None).toDF("t")
      .select(normalizeText($"t")).collect().head
    assert(n.isNullAt(0))
  }

  test("char_counts: one-pass codepoint counts, sorted, surrogate-aware") {
    import graft.functions.expressions.TextExpressions.char_counts
    def counts(s: String): Seq[Long] = Seq(Tuple1(s)).toDF("t")
      .select(char_counts($"t")).head().getSeq[Long](0)
    // "aabbbc": a=2 b=3 c=1, sorted by codepoint -> a, b, c
    assert(counts("aabbbc") === Seq(2L, 3L, 1L))
    assert(counts("") === Seq.empty)
    // an astral codepoint (surrogate pair in UTF-16) counts ONCE
    val astral = new String(Character.toChars(0x1F600)) // emoji
    assert(counts(astral + "a" + astral) === Seq(1L, 2L))
    // entropy identity: k distinct uniform chars -> sum c*ln(c) = k*(1*ln 1) = 0
    val uniform = counts("abcdef")
    assert(uniform === Seq.fill(6)(1L))
    // null text -> null array (nullIntolerant kernel)
    val nul = Seq[Option[String]](None).toDF("t")
      .select(char_counts($"t")).head()
    assert(nul.isNullAt(0))
    // total matches character count on real docs (codepoints, not UTF-16 units)
    import graft.core.Tables
    val docs = Tables.documents(spark, sfDir).limit(50)
    val bad = docs.filter(
      aggregate(char_counts($"text"), lit(0L), (acc, c) => acc + c) =!=
        length($"text")).count()
    assert(bad === 0L, "sum of counts == length() for every doc")
  }

  test("deflate_ratio separates repetitive from high-entropy text, deterministically") {
    import graft.functions.expressions.TextExpressions.deflate_ratio
    def ratio(s: String): Double = Seq(Tuple1(s)).toDF("t")
      .select(deflate_ratio($"t")).head().getDouble(0)
    val repetitive = "spam " * 400
    val rnd = new scala.util.Random(11)
    val noisy = (1 to 2000).map(_ => (33 + rnd.nextInt(90)).toChar).mkString
    assert(ratio(repetitive) < 0.1, s"runs compress hard: ${ratio(repetitive)}")
    assert(ratio(noisy) > 0.7, s"near-random stays near 1: ${ratio(noisy)}")
    assert(ratio(repetitive) === ratio(repetitive), "deterministic per JVM")
    assert(ratio("") === 1.0, "empty-string convention")
    val nul = Seq[Option[String]](None).toDF("t")
      .select(deflate_ratio($"t")).head()
    assert(nul.isNullAt(0))
    // both tails of the real corpus sit strictly between the synthetic extremes
    val docs = graft.core.Tables.documents(spark, sfDir).limit(100)
      .select(deflate_ratio($"text").as("r"))
    val (lo, hi) = docs.agg(min($"r"), max($"r"))
      .as[(Double, Double)].head()
    assert(lo > 0.05 && hi < 1.2, s"corpus ratios sane: [$lo, $hi]")
  }

  test("jaro_winkler: literature vectors, conventions, symmetry, bounds") {
    import graft.functions.expressions.TextExpressions.jaro_winkler
    def jw(a: String, b: String): Double =
      Seq((a, b)).toDF("a", "b").select(jaro_winkler($"a", $"b"))
        .as[Double].head()
    // the classic published vectors (also DuckDB's values — the kernel
    // mirrors its conventions so scores stay oracle-checkable)
    assert(jw("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(jw("JELLYFISH", "SMELLYFISH") === 0.8962962962962964)
    // odd transposition-mismatch count floors (t/2 integer), as DuckDB's
    assert(jw("ABCDEF", "BCADEF") === 0.9444444444444445)
    // prefix boost applies above the 0.7 threshold only
    assert(jw("aaa", "aaahhh") === 0.8833333333333334)
    // conventions: empty-vs-anything AND empty-vs-empty are 0 (DuckDB's
    // "no evidence" convention); identity is 1; no shared chars is 0
    assert(jw("", "ABC") === 0.0 && jw("", "") === 0.0)
    assert(jw("ABC", "ABC") === 1.0 && jw("a", "b") === 0.0)
    // symmetry + bounds on generated noisy pairs
    val pairs = (0 until 50).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jw:$i".getBytes("UTF-8"))
      (h.take(6).map(x => ('a' + ((x & 0xff) % 9)).toChar).mkString,
        h.slice(6, 13).map(x => ('a' + ((x & 0xff) % 9)).toChar).mkString)
    }
    val scored = pairs.toDF("a", "b")
      .select(jaro_winkler($"a", $"b").as("ab"), jaro_winkler($"b", $"a").as("ba"))
      .as[(Double, Double)].collect()
    assert(scored.forall { case (ab, ba) => ab == ba && ab >= 0.0 && ab <= 1.0 })
    // null propagates
    assert(Seq((Option.empty[String], Some("x"))).toDF("a", "b")
      .select(jaro_winkler($"a", $"b")).head().isNullAt(0))
  }
}
