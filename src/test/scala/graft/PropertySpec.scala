package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.sources.HttpSource

/** Property tests (SURVEY §5.2): pure logic gets full ScalaCheck sweeps;
  * Spark-touching properties run one job over a generated batch. */
class PropertySpec extends SparkSpec {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("backoff delay is monotone in retry and capped at 3600s") {
    check(Prop.forAll(Gen.choose(0, 100), Gen.choose(0, 100)) { (r1, r2) =>
      val p = HttpSource.RetryPolicy()
      val (lo, hi) = if (r1 <= r2) (r1, r2) else (r2, r1)
      p.delaySec(lo) <= p.delaySec(hi) && p.delaySec(hi) <= 3600
    })
  }

  test("sampling hex thresholds are monotone, fixed-width, order-isomorphic") {
    check(Prop.forAll(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (p1, p2) =>
      val (t1, t2) = (graft.operators.Sampling.hexThreshold(p1),
        graft.operators.Sampling.hexThreshold(p2))
      t1.length == 8 && t2.length == 8 &&
        // string order == numeric order: the property the lexicographic
        // bucket comparison in deterministicSplit/hashSample relies on
        ((p1 <= p2) == (t1 <= t2) || t1 == t2)
    })
  }

  test("pagination returns all rows and stops exactly on the short page") {
    check(Prop.forAll(Gen.choose(1, 20), Gen.choose(0, 200)) { (pageSize, total) =>
      val fetched = HttpSource.paginate(first = 0, pageSize = pageSize) { c =>
        val page = (c until math.min(c + pageSize, total))
        (page, c + page.size)
      }
      fetched == (0 until total)
    })
  }

  test("to_json . from_json = identity on generated user rows") {
    import spark.implicits._
    val users = graft.sources.FakeDataGenerator.users(spark, 200, seed = 99)
    val schema = users.schema
    val roundTripped = users.toDF()
      .select(to_json(struct(users.columns.map(col): _*)).as("j"))
      .select(from_json($"j", schema).as("r")).select("r.*")
    assert(roundTripped.except(users.toDF()).isEmpty &&
      users.toDF().except(roundTripped).isEmpty)
  }

  test("upsert-ignore row set == union+dropDuplicates row-key set (generated overlaps)") {
    import spark.implicits._
    val gen = for {
      aKeys <- Gen.listOfN(30, Gen.choose(0, 50))
      bKeys <- Gen.listOfN(30, Gen.choose(0, 50))
    } yield (aKeys, bKeys)
    // a handful of generated cases; each runs one tiny local job
    val cases = Gen.listOfN(5, gen).sample.get
    cases.foreach { case (aKeys, bKeys) =>
      val a = aKeys.distinct.map(k => (k, s"a$k")).toDF("k", "v")
      val b = bKeys.distinct.map(k => (k, s"b$k")).toDF("k", "v")
      val upserted = a.union(graft.sinks.Sinks.newRowsOnly(a, b, Seq("k")))
      val expectKeys = (aKeys ++ bKeys).distinct.sorted
      assert(upserted.select("k").as[Int].collect().sorted.toSeq === expectKeys)
      // rows present in a always win
      assert(upserted.filter($"v".startsWith("b") &&
        $"k".isin(aKeys.distinct: _*)).count() === 0)
    }
  }

  test("bpe encoding is lossless: pieces always concatenate to word + EOW") {
    import graft.functions.Bpe
    import spark.implicits._
    val docs = Seq("the cat sat on the mat the cat ran").toDF("text")
    val model = Bpe.fit(docs, "text", nMerges = 20)
    val rnd = new scala.util.Random(11)
    val words = Seq("the", "cat", "mat", "thecatmat", "zzz", "a") ++
      Seq.fill(50)(Seq.fill(1 + rnd.nextInt(8))(('a' + rnd.nextInt(5)).toChar).mkString)
    words.foreach { w =>
      val pieces = model.encodeWord(w)
      assert(pieces.mkString === w + Bpe.EOW, s"lossy encode of '$w': $pieces")
      assert(pieces.nonEmpty && pieces.forall(_.nonEmpty))
    }
    assert(model.encodeWord("") === Seq.empty)
  }

  test("scrubbing is idempotent: placeholders contain nothing scrubbable") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val texts = Seq(
      "a@b.co and c.d+e@f.org", "10.0.0.1 10.0.0.2", "42", "<NUM> 7",
      "v1.2.3 at 192.168.1.1 from x@y.io", "clean text", "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val once = graft.operators.Scrub.scrub(df, "t")
      .select("id", "t")
    val twice = graft.operators.Scrub.scrub(once, "t")
      .select(col("id"), col("t"), col("t_redactions"))
    twice.collect().foreach { r =>
      assert(r.getLong(2) === 0L, s"re-scrub found matches in '${r.getString(1)}'")
    }
    assert(once.collect().map(_.getString(1)).toSeq ===
      twice.collect().map(_.getString(1)).toSeq)
  }

  test("int8 codes are bounded: |q_sum| <= 127 * dim on the real corpus") {
    import spark.implicits._
    val stats = graft.operators.Quantize.int8Stats(
      graft.core.Tables.embeddings(spark, sfDir), "vec_id", "embedding")
    stats.collect().foreach { r =>
      val (dim, qSum, qZeros) = (r.getAs[Int]("dim"), r.getAs[Long]("q_sum"),
        r.getAs[Long]("q_zeros"))
      assert(math.abs(qSum) <= 127L * dim)
      assert(qZeros >= 0L && qZeros <= dim)
    }
  }

  test("probeAll == N single probes on a GENERATED corpus and query mix " +
      "(hits, partial misses, full misses, stopword-heavy docs)") {
    import spark.implicits._
    val rng = new scala.util.Random(1312L)
    val vocab = (1 to 60).map(i => s"v$i")
    // 120 docs of 5-40 tokens drawn with a skewed distribution (low ids
    // are stopword-like and land in most docs), plus a few empty-ish docs
    val docs = (1 to 120).map { i =>
      val n = 5 + rng.nextInt(36)
      val toks = Seq.fill(n)(vocab(math.min(
        (math.abs(rng.nextGaussian()) * 12).toInt, vocab.size - 1)))
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("ti_prop").toString
    graft.operators.TextIndex.save(docs, "doc_id", "text", path, nBuckets = 16)
    // 12 queries of 1-4 DISTINCT terms, some entirely off-vocabulary
    val querySets = (0 until 12).map { q =>
      val terms = if (q % 5 == 4) Seq(s"zz_miss_$q")
        else rng.shuffle(vocab).take(1 + rng.nextInt(4))
      q.toLong -> terms
    }
    val batched = graft.operators.TextIndex.probeAll(
        querySets.toDF("query_id", "terms"), "query_id", "terms",
        path, k = 15)
      .orderBy($"query_id", $"rank")
      .select($"query_id", $"doc_id", $"score").collect().toSeq
    val singly = querySets.flatMap { case (qid, terms) =>
      graft.operators.TextIndex.probe(spark, path, terms, k = 15)
        .select(lit(qid).as("query_id"), $"doc_id", $"score")
        .collect().toSeq
    }
    assert(batched === singly,
      s"generated-corpus batched/single divergence (${batched.size} rows)")
  }

  test("jaccard output is within [minJac, 1] and pair-ordered") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir)
    val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, minJac = 0.3).collect()
    pairs.foreach { r =>
      val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(a < b)
      assert(j >= 0.3 && j <= 1.0)
    }
  }

  test("interval join windows compose: [lo,mid) ⊎ [mid,hi) == [lo,hi)") {
    import spark.implicits._
    import graft.operators.IntervalJoin
    val events = graft.core.Tables.events(spark, sfDir)
    val l = events.filter($"event_type" === "click")
      .select($"event_id".as("lid"), $"user_id".as("lu"), $"ts".as("lts"))
    val r = events.filter($"event_type" === "view")
      .select($"event_id".as("rid"), $"user_id".as("ru"), $"ts".as("rts"))
    def pairs(lo: Long, hi: Long) =
      IntervalJoin.joinWithin(l, r, "lu", "ru", "lts", "rts", lo, hi)
        .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    val (lo, mid, hi) = (-7200L, -600L, 3600L)
    val left = pairs(lo, mid)
    val right = pairs(mid, hi)
    // half-open windows: the split point belongs to exactly one side
    assert((left & right).isEmpty, "sub-windows must be disjoint")
    assert((left | right) === pairs(lo, hi), "sub-windows must cover the whole")
  }

  test("tokenBudgetSample is monotone and nested in the budget") {
    import spark.implicits._
    import graft.operators.Sampling
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", (length($"text") % 83).cast("long").as("w"))
    val kept = Seq(100L, 400L, 1600L).map(b =>
      Sampling.tokenBudgetSample(docs, "doc_id", "w", "source", b)
        .select($"doc_id").as[Long].collect().toSet)
    // a bigger budget keeps a SUPERSET (same deterministic priority order)
    kept.sliding(2).foreach { case Seq(small, big) =>
      assert(small.subsetOf(big), s"${small.size} ⊄ ${big.size}")
    }
    assert(kept.last.nonEmpty)
  }

  test("jaro_winkler kernel: symmetric, bounded, identity, driver-pure sweep") {
    import graft.functions.expressions.TextUtil.{jaroWinkler => jw}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val word = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    check(Prop.forAll(word, word) { (a, b) =>
      val s = jw(u(a), u(b))
      s == jw(u(b), u(a)) && s >= 0.0 && s <= 1.0
    })
    check(Prop.forAll(word) { a =>
      // identity is 1 for nonempty, 0 for empty (the DuckDB convention)
      jw(u(a), u(a)) == (if (a.isEmpty) 0.0 else 1.0)
    })
    check(Prop.forAll(word, Gen.alphaChar) { (a, c) =>
      // appending one char can only move the score within bounds — and a
      // nonempty shared string keeps similarity strictly positive
      val s = jw(u(a + c), u(a + c + c))
      s >= 0.0 && s <= 1.0 && s > 0.0
    })
  }
}
