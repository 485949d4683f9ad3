package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sfDir).cache()

  private val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("split is disjoint, exhaustive, and near the requested fractions") {
    val split = Sampling.deterministicSplit(docs, "doc_id", "s1", weights)
    val total = docs.count().toDouble
    val byName = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byName.values.sum === total.toLong, "every row lands in one split")
    assert(byName.keySet === weights.map(_._1).toSet)
    weights.foreach { case (name, w) =>
      val got = byName(name) / total
      assert(math.abs(got - w) < 0.05, s"$name: got $got, want ~$w")
    }
  }

  test("split is invariant under repartitioning and re-run (no RNG)") {
    val a = Sampling.deterministicSplit(docs, "doc_id", "s1", weights)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.deterministicSplit(docs.repartition(7), "doc_id", "s1", weights)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a === b)
  }

  test("leakageSafeSplit: connected near-dup components never straddle " +
      "splits; singletons follow their own hash; exhaustive") {
    // pair graph: {1,2,3} chained, {10,11} paired, 20/21/22 singletons
    val rows = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L, 22L)
      .map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplit(rows, "doc_id", pairs,
        "id_a", "id_b", "sx:", weights)
      .select($"doc_id", $"group_key", $"split")
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) === Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L, 22L))
    // whole components share one group key and therefore one split
    val comp123 = out.filter(_._1 <= 3L)
    assert(comp123.map(_._2).distinct.size === 1)
    assert(comp123.map(_._3).distinct.size === 1, "component straddled!")
    val comp1011 = out.filter(r => r._1 == 10L || r._1 == 11L)
    assert(comp1011.map(_._3).distinct.size === 1)
    // singletons key on their own id and match the row-wise split
    val single = out.filter(_._1 >= 20L)
    assert(single.forall(r => r._2 == r._1))
    val rowWise = Sampling.deterministicSplit(
        rows.filter($"doc_id" >= 20L), "doc_id", "sx:", weights)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(single.forall(r => rowWise(r._1) == r._3))
  }

  test("different salts draw independent assignments") {
    val a = Sampling.deterministicSplit(docs, "doc_id", "s1", weights)
      .filter($"split" === "train").select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSplit(docs, "doc_id", "s2", weights)
      .filter($"split" === "train").select("doc_id").as[Long].collect().toSet
    assert(a !== b, "distinct salts should not reproduce the same split")
    // and both are still ~80%
    assert(math.abs(b.size.toDouble / docs.count() - 0.8) < 0.05)
  }

  test("hashSample keeps ~fraction of rows and is a subset-stable filter") {
    val s10 = Sampling.hashSample(docs, "doc_id", 0.1, "s1")
      .select("doc_id").as[Long].collect().toSet
    val s30 = Sampling.hashSample(docs, "doc_id", 0.3, "s1")
      .select("doc_id").as[Long].collect().toSet
    assert(math.abs(s10.size.toDouble / docs.count() - 0.1) < 0.04)
    // same salt, larger fraction ⊇ smaller fraction (threshold family)
    assert(s10.subsetOf(s30), "nested thresholds must nest the samples")
  }

  test("stratifiedSample caps named strata, keeps the rest whole, nests by salt") {
    val langs = docs.select($"lang").distinct().as[String].collect().toSet
    val capped = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.5), defaultFraction = 1.0)
    val counts = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val sampled = capped.groupBy($"lang").count().as[(String, Long)].collect().toMap
    // non-capped strata survive untouched
    (langs - "en").foreach(l => assert(sampled(l) === counts(l), s"stratum $l"))
    // the capped stratum lands near its fraction
    val ratio = sampled("en").toDouble / counts("en")
    assert(ratio > 0.3 && ratio < 0.7, s"en ratio $ratio")
    // deterministic, and nested: 0.25 sample ⊆ 0.5 sample under one salt
    val quarter = Sampling.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 0.25), defaultFraction = 1.0)
      .filter($"lang" === "en").select($"doc_id").as[Long].collect().toSet
    val half = capped.filter($"lang" === "en")
      .select($"doc_id").as[Long].collect().toSet
    assert(quarter.subsetOf(half))
    // narrow map: no exchange
    assert(!capped.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("mixture hits target proportions by downsampling, binding corpus kept whole") {
    // big: 400 docs, small: 100 docs; ask for 50/50 -> small binds (T = 200),
    // big samples at ~0.25, small keeps everything
    val big = docs.filter($"doc_id" < 400)
    val small = docs.filter($"doc_id" >= 400 && $"doc_id" < 500)
    val mixed = Sampling.mixture(
      Seq(("web", big, 0.5), ("books", small, 0.5)), "doc_id").cache()
    val bySource = mixed.groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(bySource("books") === small.count(), "binding corpus keeps all rows")
    val ratio = bySource("web").toDouble / big.count()
    assert(ratio > 0.15 && ratio < 0.35, s"web sample rate $ratio, want ~0.25")
    // deterministic across re-runs and repartitioning
    val again = Sampling.mixture(
      Seq(("web", big.repartition(7), 0.5), ("books", small, 0.5)), "doc_id")
    assert(again.select($"doc_id").as[Long].collect().sorted.toSeq ===
      mixed.select($"doc_id").as[Long].collect().sorted.toSeq)
    // a corpus at proportion 1 alone is the identity
    val solo = Sampling.mixture(Seq(("only", small, 1.0)), "doc_id")
    assert(solo.count() === small.count())
  }

  test("mixture rejects an empty corpus instead of silently returning nothing") {
    // empty corpus -> t = min(n_i/p_i) = 0 would zero out every OTHER
    // corpus's rate; the operator must fail loudly naming the culprit
    val small = docs.filter($"doc_id" >= 400 && $"doc_id" < 500)
    val empty = docs.filter($"doc_id" < 0)
    val err = intercept[IllegalArgumentException] {
      Sampling.mixture(Seq(("web", small, 0.5), ("void", empty, 0.5)), "doc_id")
    }
    assert(err.getMessage.contains("void"))
  }

  test("tokenBudgetSample == naive window cumsum, bit for bit") {
    import org.apache.spark.sql.expressions.Window
    // weights derived from text length: varied, includes the real skew of
    // the fixture; several budgets probe different cut points
    val weighted = docs.select($"doc_id", $"source",
      (length($"text") % 97).cast("long").as("w"))
    val wNaive = Window.partitionBy($"source")
      .orderBy(Sampling.hashBucket($"doc_id", "budget:").asc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for (budget <- Seq(0L, 1L, 137L, 1000L, 1000000L)) {
      val naive = weighted.withColumn("cum", sum($"w").over(wNaive))
        .filter($"cum" <= budget).select($"doc_id").as[Long].collect().sorted.toSeq
      val fast = Sampling.tokenBudgetSample(weighted, "doc_id", "w", "source", budget)
        .select($"doc_id").as[Long].collect().sorted.toSeq
      assert(fast === naive, s"budget $budget")
    }
  }

  test("tokenBudgetSample: huge budget is identity; zero-weight boundary row kept") {
    val weighted = docs.select($"doc_id", $"source", lit(10L).as("w"))
    assert(Sampling.tokenBudgetSample(weighted, "doc_id", "w", "source",
      Long.MaxValue / 4).count() === docs.count())
    // one stratum, weights 10; budget 10 keeps exactly the first row per
    // stratum plus any zero-weight row sitting at cum == budget
    val one = weighted.withColumn("w",
      when($"doc_id" % 2 === 0, 0L).otherwise(10L))
    val kept = Sampling.tokenBudgetSample(one, "doc_id", "w", "source", 10L)
    // every kept row's inclusive cumsum really is <= 10
    assert(kept.groupBy($"source").agg(sum($"w").as("tot"))
      .filter($"tot" > 10).count() === 0)
    // fractional weights are rejected, not silently truncated
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSample(
        docs.select($"doc_id", $"source", lit(1.5).as("w")),
        "doc_id", "w", "source", 10L)
    }
  }

  test("tokenBudgetSample fails loudly on a negative weight") {
    // a negative weight breaks cumsum monotonicity and would silently
    // corrupt the keep/drop/straddle classification — the guard must
    // abort the job naming the value, not return a wrong sample
    val bad = docs.select($"doc_id", $"source",
      when($"doc_id" === 123L, -7L).otherwise(10L).as("w"))
    val err = intercept[Exception] {
      Sampling.tokenBudgetSample(bad, "doc_id", "w", "source", 1000L).count()
    }
    assert(err.getMessage.contains("negative weight"), err.getMessage)
  }

  test("tokenBudgetSample budgets a null stratum as its own partition") {
    import org.apache.spark.sql.expressions.Window
    // null source rows form one partition under the naive window form;
    // the cell join must be null-safe or they silently vanish
    val weighted = docs.select($"doc_id",
      when($"doc_id" % 3 === 0, lit(null: String)).otherwise($"source")
        .as("source"),
      (length($"text") % 97).cast("long").as("w"))
    val wNaive = Window.partitionBy($"source")
      .orderBy(Sampling.hashBucket($"doc_id", "budget:").asc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for (budget <- Seq(137L, 1000L)) {
      val naive = weighted.withColumn("cum", sum($"w").over(wNaive))
        .filter($"cum" <= budget).select($"doc_id").as[Long].collect().sorted.toSeq
      val fast = Sampling.tokenBudgetSample(weighted, "doc_id", "w", "source", budget)
        .select($"doc_id").as[Long].collect().sorted.toSeq
      assert(fast === naive, s"budget $budget")
      // and the null stratum really is represented in the output
      assert(Sampling.tokenBudgetSample(weighted, "doc_id", "w", "source", budget)
        .filter($"source".isNull).count() > 0, s"budget $budget: null stratum dropped")
    }
  }

  test("shuffleShards: disjoint, dense ranks, deterministic, range-assigned") {
    val n = 8
    val sharded = Sampling.shuffleShards(docs, "doc_id", n).cache()
    assert(sharded.count() === docs.count())
    // shard ids in [0, n); pos is 1..count within each shard (dense total order)
    assert(sharded.filter($"shard" < 0 || $"shard" >= n).count() === 0)
    val perShard = sharded.groupBy($"shard")
      .agg(count(lit(1)).as("cnt"), max($"pos").as("mx"), min($"pos").as("mn"),
        countDistinct($"pos").as("dst"))
    assert(perShard.filter($"mx" =!= $"cnt" || $"mn" =!= 1 || $"dst" =!= $"cnt")
      .count() === 0, "pos must be a dense 1..count rank per shard")
    // assignment == the hexThreshold range ladder (independent derivation)
    val bucket = Sampling.hashBucket($"doc_id", "shuffle:")
    val ladder = (1 until n).foldRight(lit(n - 1)) { (i, rest) =>
      when(bucket < Sampling.hexThreshold(i.toDouble / n), i - 1).otherwise(rest)
    }
    assert(docs.withColumn("expect", ladder)
      .join(sharded.select($"doc_id", $"shard"), "doc_id")
      .filter($"expect" =!= $"shard").count() === 0)
    // repartition-invariant (no RNG, no partition-order dependence)
    val again = Sampling.shuffleShards(docs.repartition(7), "doc_id", n)
      .select($"doc_id", $"shard", $"pos").as[(Long, Int, Int)].collect().toSet
    assert(again === sharded.select($"doc_id", $"shard", $"pos")
      .as[(Long, Int, Int)].collect().toSet)
  }

  test("writeShards: one ordered file per shard; file order == shuffle order") {
    val n = 4
    val dir = java.nio.file.Files.createTempDirectory("shards").toString + "/out"
    Sampling.writeShards(docs.select($"doc_id", $"text"), "doc_id", n, dir)
    val expected = Sampling.shuffleShards(docs.select($"doc_id", $"text"), "doc_id", n)
      .select($"doc_id", $"shard", $"pos").as[(Long, Int, Int)].collect()
      .groupBy(_._2).view.mapValues(_.sortBy(_._3).map(_._1).toSeq).toMap
    for (shard <- 0 until n if expected.contains(shard)) {
      val files = java.nio.file.Files.list(
          java.nio.file.Paths.get(dir, s"shard=$shard"))
        .filter(p => p.toString.endsWith(".parquet")).count()
      assert(files === 1, s"shard $shard must be one file, got $files")
      // a single parquet file read back preserves row order = shuffle order
      val got = spark.read.parquet(s"$dir/shard=$shard")
        .select($"doc_id").as[Long].collect().toSeq
      assert(got === expected(shard), s"shard $shard order")
    }
  }

  test("split assignment is a narrow map: no exchange in the plan") {
    val plan = Sampling.deterministicSplit(docs, "doc_id", "s1", weights)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1000))
  }

  private def naiveTopFraction(df: org.apache.spark.sql.DataFrame,
      fraction: Double): Set[Long] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"q".desc, $"doc_id".asc)
    val wn = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
    df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .filter($"rn" <= ceil($"n" * lit(fraction)).cast("long"))
      .select($"doc_id").as[Long].collect().toSet
  }

  test("topFractionByScore == naive per-stratum window, across fractions") {
    val scored = docs.select($"doc_id", $"lang",
      graft.functions.TextFunctions.qualityScore($"text").as("q")).cache()
    for (f <- Seq(0.0, 0.1, 1.0 / 3.0, 0.9, 1.0)) {
      val got = Sampling.topFractionByScore(scored, "doc_id", "q", "lang", f)
        .select($"doc_id").as[Long].collect()
      assert(got.length === got.toSet.size, s"f=$f: duplicates")
      assert(got.toSet === naiveTopFraction(scored, f), s"f=$f")
    }
    // tiny bin count forces nearly everything through the straddle path —
    // the histogram must still produce the exact window answer
    val coarse = Sampling.topFractionByScore(scored, "doc_id", "q", "lang",
      1.0 / 3.0, bins = 2).select($"doc_id").as[Long].collect().toSet
    assert(coarse === naiveTopFraction(scored, 1.0 / 3.0))
  }

  test("topFractionByScore: constant-score stratum degenerates to id order; guards") {
    val flat = Seq((1L, "x", 5.0), (2L, "x", 5.0), (3L, "x", 5.0), (4L, "x", 5.0))
      .toDF("doc_id", "lang", "q")
    val kept = Sampling.topFractionByScore(flat, "doc_id", "q", "lang", 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L)) // ties -> lowest ids
    intercept[IllegalArgumentException] {
      Sampling.topFractionByScore(flat, "doc_id", "q", "lang", 1.5)
    }
    val withNaN = Seq((1L, "x", 1.0), (2L, "x", Double.NaN)).toDF("doc_id", "lang", "q")
    val e = intercept[Exception] {
      Sampling.topFractionByScore(withNaN, "doc_id", "q", "lang", 0.5).count()
    }
    assert(e.getMessage.contains("NaN") || e.getCause != null)
  }

  test("topFractionByScore is partition-invariant; no full-stratum sort for fine bins") {
    val scored = docs.select($"doc_id", $"lang",
      graft.functions.TextFunctions.qualityScore($"text").as("q"))
    val a = Sampling.topFractionByScore(scored, "doc_id", "q", "lang", 0.25)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.topFractionByScore(scored.repartition(7), "doc_id", "q", "lang", 0.25)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("epochMixture: integral epochs replicate exactly; fraction adds a hashSample subset") {
    val m = Sampling.epochMixture(docs, "doc_id", "lang",
      Map("zh" -> 2.25, "de" -> 2.0), defaultEpochs = 1.0)
    val rows = m.select($"doc_id", $"lang", $"epoch").as[(Long, String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    val langOf = docs.select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    // de: exactly 2 copies each; others: exactly 1
    langOf.foreach { case (id, lang) =>
      lang match {
        case "de" => assert(rows(id) === Seq(1L, 2L), s"doc $id")
        case "zh" => assert(rows(id) === Seq(1L, 2L) || rows(id) === Seq(1L, 2L, 3L))
        case _    => assert(rows(id) === Seq(1L), s"doc $id")
      }
    }
    // the zh third copies are EXACTLY the 0.25 hashSample of zh docs
    val third = rows.collect { case (id, es) if es.contains(3L) => id }.toSet
    val expected = Sampling.hashSample(
        docs.filter($"lang" === "zh"), "doc_id", 0.25, "epoch:")
      .select($"doc_id").as[Long].collect().toSet
    assert(third === expected)
  }

  test("epochMixture: fractions below 1 downsample; zero drops the stratum") {
    val m = Sampling.epochMixture(docs, "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.0), defaultEpochs = 1.0)
    assert(m.filter($"lang" === "de").count() === 0L)
    val kept = m.filter($"lang" === "en").select($"doc_id").as[Long].collect()
    assert(kept.toSet === Sampling.hashSample(
      docs.filter($"lang" === "en"), "doc_id", 0.5, "epoch:")
      .select($"doc_id").as[Long].collect().toSet)
    assert(kept.length === kept.toSet.size, "downsampled stratum has one copy per doc")
    // extra-copy selections NEST: the 0.25 subset is inside the 0.5 subset
    val at25 = Sampling.epochMixture(docs, "doc_id", "lang", Map("en" -> 1.25))
      .filter($"lang" === "en" && $"epoch" === 2L).select($"doc_id").as[Long].collect().toSet
    val at50 = Sampling.epochMixture(docs, "doc_id", "lang", Map("en" -> 1.5))
      .filter($"lang" === "en" && $"epoch" === 2L).select($"doc_id").as[Long].collect().toSet
    assert(at25.subsetOf(at50))
  }

  test("weightedSample: heavy weights dominate; deterministic; k >= n is identity") {
    // two planted weight classes: ids 0-99 at w=10000, ids 100-199 at w=1.
    // A-ES inclusion is proportional to weight, so a k=50 sample should be
    // drawn (near-)entirely from the heavy class.
    val rows = (0L until 100L).map(i => (i, 10000)) ++
      (100L until 200L).map(i => (i, 1))
    val df = rows.toDF("id", "w")
    val picked = Sampling.weightedSample(df, "id", "w", k = 50)
      .select($"id").as[Long].collect().toSet
    assert(picked.size === 50)
    assert(picked.count(_ < 100L) >= 48, s"heavy class underdrawn: $picked")

    // no RNG: identical under re-run and repartitioning
    val again = Sampling.weightedSample(df.repartition(7), "id", "w", k = 50)
      .select($"id").as[Long].collect().toSet
    assert(again === picked)

    // k >= n keeps everything
    assert(Sampling.weightedSample(df, "id", "w", k = 500).count() === 200L)
  }

  test("weightedSample == naive window formulation; guards fire") {
    // independent formulation: compute the same keys via expressions and
    // rank with a window — must select the identical row set
    val df = docs.select($"doc_id", $"n_chars")
    val expected = df
      .withColumn("u",
        (conv(substring(md5(concat(lit("ws:"), $"doc_id".cast("string"))), 1, 8),
          16, 10).cast("double") + 0.5) / 4294967296.0)
      .withColumn("k", round(pow($"u", lit(1.0) / $"n_chars".cast("double")), 6))
      .orderBy($"k".desc, $"doc_id".asc).limit(37)
      .select($"doc_id").as[Long].collect().toSet
    val got = Sampling.weightedSample(df, "doc_id", "n_chars", k = 37)
      .select($"doc_id").as[Long].collect().toSet
    assert(got === expected)

    // nonpositive and null weights fail loudly
    val bad = Seq((1L, 5), (2L, 0)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.weightedSample(bad, "id", "w", k = 1).collect()
    }
    assert(e.getMessage.contains("weightedSample") ||
      e.getCause != null && e.getCause.getMessage.contains("weightedSample"))
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(bad, "id", "w", k = 0)
    }
  }

  test("weightedSample plans as one TakeOrdered: no global sort exchange") {
    val plan = Sampling.weightedSample(
        docs.select($"doc_id", $"n_chars"), "doc_id", "n_chars", k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
    assert(!plan.contains("Sort ["), s"unexpected full sort:\n$plan")
  }

  test("epochMixture is partition-invariant, zero-shuffle, and rejects bad epochs") {
    val a = Sampling.epochMixture(docs, "doc_id", "lang", Map("zh" -> 2.5))
      .select($"doc_id", $"epoch").as[(Long, Long)].collect().sorted.toSeq
    val b = Sampling.epochMixture(docs.repartition(7), "doc_id", "lang", Map("zh" -> 2.5))
      .select($"doc_id", $"epoch").as[(Long, Long)].collect().sorted.toSeq
    assert(a === b)
    val plan = Sampling.epochMixture(docs, "doc_id", "lang", Map("zh" -> 2.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1000))
    intercept[IllegalArgumentException] {
      Sampling.epochMixture(docs, "doc_id", "lang", Map("zh" -> -0.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.epochMixture(docs, "doc_id", "lang", Map.empty, defaultEpochs = Double.NaN)
    }
  }

  test("temperatureShares: alpha endpoints, flattening monotonicity, validation") {
    val rows = Seq(("big", 900L), ("big", 100L), ("mid", 90L), ("tiny", 10L))
      .toDF("src", "w")
    def shares(alpha: Double): Map[String, Double] =
      Sampling.temperatureShares(rows, "src", "w", alpha, budget = 1000L)
        .select($"stratum", $"share").as[(String, Double)].collect().toMap
    // alpha = 1: proportional to mass (1000, 90, 10 of 1100)
    val s1 = shares(1.0)
    assert(math.abs(s1("big") - 1000.0 / 1100) < 1e-12)
    // alpha = 0: uniform regardless of mass
    val s0 = shares(0.0)
    assert(s0.values.forall(v => math.abs(v - 1.0 / 3) < 1e-12))
    // alpha = 0.5 flattens: the dominant source gives up share, the tiny
    // one gains — and the shares still sum to 1
    val s5 = shares(0.5)
    assert(s5("big") < s1("big") && s5("tiny") > s1("tiny"))
    assert(math.abs(s5.values.sum - 1.0) < 1e-12)
    // budgets: floor(share * budget), never exceeding the budget in sum
    val t = Sampling.temperatureShares(rows, "src", "w", 0.5, budget = 1000L)
      .select($"target_rows").as[Long].collect()
    assert(t.sum <= 1000L && t.forall(_ >= 0L))
    intercept[IllegalArgumentException] {
      Sampling.temperatureShares(rows, "src", "w", 1.5, 10L)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureShares(rows.withColumn("w", $"w".cast("double")),
        "src", "w", 0.5, 10L)
    }
  }
}
