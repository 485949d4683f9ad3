package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Ground truth: the quadratic definition. */
  private def naive(l: DataFrame, r: DataFrame, t: Int): Set[(Long, Long, Long)] =
    l.select($"id".as("id_a"), $"k".as("ka"))
      .crossJoin(r.select($"id".as("id_b"), $"k".as("kb")))
      .withColumn("dist", levenshtein($"ka", $"kb").cast("long"))
      .filter($"dist" <= t)
      .select($"id_a", $"id_b", $"dist")
      .as[(Long, Long, Long)].collect().toSet

  private def blocked(l: DataFrame, r: DataFrame, t: Int): Set[(Long, Long, Long)] =
    FuzzyJoin.editDistancePairs(l, r, "id", "k", "id", "k", t)
      .as[(Long, Long, Long)].collect().toSet

  test("segment blocking is lossless: equals the cross-join definition") {
    // adversarial lengths: empty, below maxDist, at the pigeonhole
    // boundary, and normal-length keys with planted 1-2 edit variants
    val base = Seq("johnson", "jonson", "johnsen", "smith", "smyth", "smithe",
      "garcia-lopez", "garcia lopez", "zhang wei", "zhang wai",
      "a", "ab", "", "xy", "abc", "acb", "kowalski", "kowalsky",
      "0441-7721-9", "0441-7720-9", "hernandez", "hernandes")
    val docs = base.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "k")
    // t=1,2 exercise the SymSpell deletion path; t=3 the PassJoin segments
    for (t <- Seq(1, 2, 3)) {
      assert(blocked(docs, docs, t) === naive(docs, docs, t), s"t=$t")
    }
    assert(naive(docs, docs, 1).exists(p => p._1 != p._2),
      "fixture must contain nontrivial close pairs")
  }

  test("lossless on 500 generated keys with planted typos (t=1)") {
    // declaratively generated: 400 distinct-ish codes + 100 one-edit
    // variants of the first 100 (substitution at a hash-picked position)
    val codes = spark.range(400).select($"id",
      concat(lit("code-"), md5($"id".cast("string")).substr(1, 8)).as("k"))
    val variants = spark.range(400, 500).select($"id",
      concat(lit("code-"), lit("X"),
        md5(($"id" - 400).cast("string")).substr(2, 7)).as("k"))
    val all = codes.unionByName(variants)
    assert(blocked(all, all, 1) === naive(all, all, 1))
  }

  test("short-key branch: everything at or below maxDist length still pairs") {
    val tiny = Seq((1L, ""), (2L, "a"), (3L, "b"), (4L, "ab"), (5L, "ba"),
      (6L, "abc")).toDF("id", "k")
    for (t <- Seq(1, 2)) {
      assert(blocked(tiny, tiny, t) === naive(tiny, tiny, t), s"t=$t")
    }
  }
  test("unicode keys: multi-byte chars count as single edits (vs cross-join truth)") {
    // levenshtein, substring and length are all codepoint-based in both the
    // blocking and the verification; accented/CJK keys must agree with the
    // quadratic definition
    val uni = Seq((1L, "m\u00fcller"), (2L, "muller"), (3L, "m\u00fcllers"),
      (4L, "\u6771\u4eac"), (5L, "\u6771\u4eac\u90fd"), (6L, "\u4eac\u90fd"),
      (7L, "caf\u00e9"), (8L, "cafe"), (9L, "coffee"))
      .toDF("id", "k")
    for (t <- Seq(1, 2, 3)) {
      assert(blocked(uni, uni, t) === naive(uni, uni, t), s"t=$t")
    }
    assert(naive(uni, uni, 1).exists(p => p._1 != p._2),
      "fixture must contain nontrivial unicode close pairs")
  }

  test("asymmetric sides: small probe table against a larger right side") {
    val right = spark.range(300).select($"id",
      concat(lit("sku-"), md5($"id".cast("string")).substr(1, 10)).as("k"))
    val left = spark.range(5).select(($"id" + 1000L).as("id"),
      concat(lit("sku-"), lit("Z"), md5($"id".cast("string")).substr(2, 9)).as("k"))
    for (t <- Seq(1, 2)) {
      assert(blocked(left, right, t) === naive(left, right, t), s"t=$t")
    }
  }

  test("jaroWinklerPairs: blocked == brute force within the blocking's reach; " +
      "length band loses nothing; no cross join") {
    import graft.functions.expressions.TextUtil.{jaroWinkler => jw}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // 120 base names + interior-typo variants (soundex-stable: the first
    // letter is never touched, which is exactly the documented blocking
    // contract)
    val names = (0 until 120).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"name:$i".getBytes("UTF-8"))
      (100L + i, "smith" + h.take(4).map(b => ('a' + ((b & 0xff) % 26)).toChar).mkString)
    }
    val variants = names.take(60).map { case (id, n) =>
      // swap two interior chars — a transposition JW scores high
      val cs = n.toCharArray; val t = cs(2); cs(2) = cs(3); cs(3) = t
      (id + 1000L, new String(cs))
    }
    val all = (names ++ variants).toDF("id", "k")
    val minSim = 0.92
    val got = graft.operators.FuzzyJoin
      .jaroWinklerPairs(all, all, "id", "k", minSim)
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // brute-force truth restricted to soundex-equal pairs (the blocking's
    // documented reach — outside it the operator promises nothing)
    val rows = (names ++ variants)
    val sdx = all.select($"id", soundex($"k").as("s"))
      .as[(Long, String)].collect().toMap
    val expected = (for {
      (ia, ka) <- rows; (ib, kb) <- rows
      if ia < ib && sdx(ia) == sdx(ib) && jw(u(ka), u(kb)) >= minSim
    } yield (ia, ib)).toSet
    assert(got === expected,
      "blocked result must equal brute force within soundex reach")
    assert(got.nonEmpty, "fixture must produce matches")
    // blocking recall on the planted transpositions: every pair whose
    // soundex survived the mutation is found (implied by the equality
    // above, asserted explicitly), and the LOSSY remainder — a
    // transposition can reorder soundex codes or trip the h/w adjacency
    // rule — stays a minority, which is the operator's documented
    // recall contract for the default blocking
    val planted = names.take(60).map { case (id, _) => (id, id + 1000L) }
    val reachable = planted.filter { case (a, b) => sdx(a) == sdx(b) }
    assert(reachable.forall(got.contains),
      "every soundex-stable planted pair must be found")
    assert(reachable.size >= planted.size * 6 / 10,
      s"soundex kept only ${reachable.size}/60 planted transpositions")
    // plan: equi-join on the block key, never a cartesian
    val plan = graft.operators.FuzzyJoin
      .jaroWinklerPairs(all, all, "id", "k", minSim)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    // validation: the band needs jw > 0.8
    intercept[IllegalArgumentException] {
      graft.operators.FuzzyJoin.jaroWinklerPairs(all, all, "id", "k", 0.7)
    }
  }

  test("sortedNeighborhoodPairs == brute-force rank window; first-char typo reachable " +
      "via the reversed-key pass") {
    // deterministic keys with a hot shared prefix (exercises uneven cells)
    val rows = (0 until 300).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"snm:$i".getBytes("UTF-8"))
      val body = h.take(5).map(b => ('a' + ((b & 0xff) % 26)).toChar).mkString
      (i.toLong, (if (i % 3 == 0) "zz" else "") + body)
    }
    val df = rows.toDF("id", "k")
    for (w <- Seq(1, 5, 12)) {
      val got = graft.operators.FuzzyJoin
        .sortedNeighborhoodPairs(df, "id", "k", w)
        .select($"id_a", $"id_b", $"rank_dist")
        .as[(Long, Long, Long)].collect().toSet
      val sorted = rows.sortBy { case (id, k) => (k, id) }.map(_._1)
      val expected = (for {
        i <- sorted.indices; j <- (i + 1) to math.min(i + w, sorted.size - 1)
      } yield (sorted(i), sorted(j), (j - i).toLong)).toSet
      assert(got === expected, s"window $w")
    }
    // the multi-pass story: "melissa" vs "aelissa" (first-char typo) sit
    // far apart on the raw key but adjacent once REVERSED
    val names = Seq((1L, "melissa"), (2L, "aelissa"), (3L, "harold"),
      (4L, "melinda"), (5L, "zz_filler")).toDF("id", "name")
    val fwd = graft.operators.FuzzyJoin.sortedNeighborhoodPairs(
        names, "id", "name", window = 1)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(!fwd.contains((2L, 1L)) && !fwd.contains((1L, 2L)),
      "forward pass cannot reach the first-char typo at window 1")
    val rev = graft.operators.FuzzyJoin.sortedNeighborhoodPairs(
        names.withColumn("rk", reverse($"name")), "id", "rk", window = 1)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(rev.contains((1L, 2L)) || rev.contains((2L, 1L)),
      s"reversed pass must adjoin the typo pair: $rev")
    intercept[IllegalArgumentException] {
      graft.operators.FuzzyJoin.sortedNeighborhoodPairs(df, "id", "k", 0)
    }
  }
}
