package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Dedup
import graft.pipelines.TrainingDataPipeline
import graft.pipelines.TrainingDataPipeline.Config

class TrainingDataPipelineSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sfDir).cache()
  private val cfg = Config(minQuality = 0.1, nearDupJaccard = 0.8)

  test("curation funnel is monotonically decreasing and non-empty") {
    val f = TrainingDataPipeline.funnel(docs, cfg = cfg)
    assert(f("input") === docs.count())
    assert(f("after_filters") <= f("input"))
    assert(f("after_exact_dedup") <= f("after_filters"))
    assert(f("after_near_dedup") <= f("after_exact_dedup"))
    assert(f("after_near_dedup") > 0, s"funnel emptied the corpus: $f")
  }

  test("funnelFrame equals the driver-side funnel map, stage-ordered") {
    val m = TrainingDataPipeline.funnel(docs, cfg = cfg)
    val f = TrainingDataPipeline.funnelFrame(docs, cfg = cfg)
      .orderBy($"ord").as[(Int, String, Long)].collect().toSeq
    assert(f.map(_._1) === Seq(1, 2, 3, 4), "stages in pipeline order")
    assert(f.map(r => r._2 -> r._3).toMap === m)
  }

  test("curated corpus has no near-duplicate pairs left at the threshold") {
    val curated = TrainingDataPipeline.curate(docs, cfg = cfg).cache()
    val remaining = Dedup.ngramJaccardPairs(curated, "doc_id", "text",
      n = cfg.shingleSize, minJac = cfg.nearDupJaccard)
    assert(remaining.count() === 0)
  }

  test("curation removed the known near-dup losers and is idempotent") {
    val curated = TrainingDataPipeline.curate(docs, cfg = cfg).cache()
    // canonical member (min doc_id) of each near-dup pair survives
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        n = cfg.shingleSize, minJac = cfg.nearDupJaccard)
      .as[(Long, Long, Double)].collect()
    val curatedIds = curated.select("doc_id").as[Long].collect().toSet
    pairs.foreach { case (a, b, _) =>
      assert(!curatedIds.contains(b) || !curatedIds.contains(a),
        s"pair ($a,$b) fully survived curation")
    }
    val again = TrainingDataPipeline.curate(curated, cfg = cfg)
    assert(again.count() === curated.count(), "idempotent on its own output")
  }

  test("ledgerFrame: first-failure-wins reason per input doc, every branch, " +
      "in pipeline order (the q224 composition through the pipeline API)") {
    val good = (1 to 50).map(i => if (i % 3 == 0) "the" else s"word$i")
      .mkString(" ")
    val ndBase = (1 to 60).map(i => if (i % 3 == 0) "and" else s"near$i")
    val fixture = Seq(
      1L -> good,                                   // kept (digest keeper)
      9L -> good,                                   // exact_dup of 1
      3L -> "le la les et je tu il nous vous de un une dans pour avec",
      4L -> ("the " + Seq.fill(19)("???").mkString(" ")), // en but junk
      5L -> "the cat sat on the mat and the dog ran with the ball",
      6L -> (1 to 40).map(i => if (i % 3 == 0) "of" else s"mid$i")
        .mkString(" "),                             // 40 words < Gopher's 50
      7L -> ndBase.mkString(" "),                   // near-dup keeper
      8L -> ndBase.updated(1, "changed").mkString(" ")) // near-dup loser
      .toDF("doc_id", "text")
    val lcfg = Config(minQuality = 0.3, minTokens = 30,
      allowedLangs = Set("en"), nearDupJaccard = 0.8,
      gopherRules = Some(graft.operators.QualityRules.Config()))
    val ledger = TrainingDataPipeline.ledgerFrame(fixture, cfg = lcfg)
      .as[(Long, String)].collect().toMap
    assert(ledger === Map(
      1L -> "kept", 9L -> "exact_dup", 3L -> "lang_filter",
      4L -> "quality", 5L -> "min_tokens", 6L -> "gopher_quality",
      7L -> "kept", 8L -> "near_dup"))
    // the ledger's survivors ARE curate's output
    val curatedIds = TrainingDataPipeline.curate(fixture, cfg = lcfg)
      .select($"doc_id").as[Long].collect().toSet
    assert(ledger.filter(_._2 == "kept").keySet === curatedIds)
  }

  test("ledgerFrame reason counts reproduce the funnel deltas on the real " +
      "corpus; kept rows equal curate") {
    val reasons = TrainingDataPipeline.ledgerFrame(docs, cfg = cfg)
      .groupBy($"reason").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap.withDefaultValue(0L)
    val f = TrainingDataPipeline.funnel(docs, cfg = cfg)
    assert(reasons.values.sum === f("input"),
      "one ledger row per input document")
    val filteredOut = reasons("lang_filter") + reasons("quality") +
      reasons("min_tokens") + reasons("gopher_quality")
    assert(f("after_filters") === f("input") - filteredOut)
    assert(f("after_exact_dedup") === f("after_filters") - reasons("exact_dup"))
    assert(f("after_near_dedup") === f("after_exact_dedup") - reasons("near_dup"))
    val keptIds = TrainingDataPipeline.ledgerFrame(docs, cfg = cfg)
      .filter($"reason" === "kept").select($"doc_id").as[Long].collect().toSet
    val curatedIds = TrainingDataPipeline.curate(docs, cfg = cfg)
      .select($"doc_id").as[Long].collect().toSet
    assert(keptIds === curatedIds)
  }

  test("cluster mode keeps exactly one doc per transitive near-dup cluster") {
    // Chain fixture A(10) ~ M(30) ~ C(20) with A !~ C, middle id LARGEST:
    // shingle math at 3-grams — base = 40 tokens (38 shingles), each end
    // adds a distinct 14-token suffix (52 shingles): J(end, mid) = 38/52 ≈
    // 0.73 >= 0.7, J(A, C) = 38/66 ≈ 0.58 < 0.7. The pairwise rule keeps
    // BOTH local minima {10, 20} (each end's only near-dup, 30, is larger);
    // cluster mode collapses the transitive chain to its minimum {10}.
    val base = Seq.tabulate(40)(i => s"tok$i").mkString(" ")
    val a = base + " " + Seq.tabulate(14)(i => s"enda$i").mkString(" ")
    val c = base + " " + Seq.tabulate(14)(i => s"endc$i").mkString(" ")
    val fixture = Seq((10L, a), (20L, c), (30L, base))
      .toDF("doc_id", "text")
    val loose = Config(minQuality = -1.0, minTokens = 1, nearDupJaccard = 0.7,
      allowedLangs = Set("en", "de", "fr", "es", "und"))
    val pairIds = TrainingDataPipeline.curate(fixture, cfg = loose)
      .select("doc_id").as[Long].collect().toSet
    val clusterIds = TrainingDataPipeline.curate(fixture,
        cfg = loose.copy(clusterNearDups = true))
      .select("doc_id").as[Long].collect().toSet
    assert(pairIds === Set(10L, 20L), s"pairwise rule kept $pairIds")
    assert(clusterIds === Set(10L), s"cluster mode kept $clusterIds")
  }

  test("splitFrame: related-but-not-duplicate survivors co-locate in one " +
      "split; unrelated docs follow their own hash; the guard validates") {
    // the cluster-mode shingle fixture, under a HIGHER dedup threshold so
    // the whole chain SURVIVES curation (0.73 < 0.8) while the split
    // guard at 0.5 still groups it (0.73 and 0.58 both >= 0.5)
    val base = Seq.tabulate(40)(i => s"tok$i").mkString(" ")
    val a = base + " " + Seq.tabulate(14)(i => s"enda$i").mkString(" ")
    val c = base + " " + Seq.tabulate(14)(i => s"endc$i").mkString(" ")
    val fixture = Seq(
      (10L, a), (20L, c), (30L, base),
      (40L, Seq.tabulate(40)(i => s"alpha$i").mkString(" ")),
      (50L, Seq.tabulate(40)(i => s"beta$i").mkString(" ")))
      .toDF("doc_id", "text")
    val loose = Config(minQuality = -1.0, minTokens = 1, nearDupJaccard = 0.8,
      allowedLangs = Set("en", "de", "fr", "es", "und"))
    val out = TrainingDataPipeline.splitFrame(fixture, cfg = loose,
        salt = "sx:", splitJaccard = 0.5)
      .select($"doc_id", $"group_key", $"split")
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) === Seq(10L, 20L, 30L, 40L, 50L),
      "nothing reaches the 0.8 dedup threshold, so all five survive")
    val chain = out.filter(_._1 <= 30L)
    assert(chain.map(_._2).distinct.size === 1, s"chain must group: $chain")
    assert(chain.map(_._3).distinct.size === 1, s"chain straddled: $chain")
    assert(out.filter(_._1 >= 40L).forall(r => r._2 == r._1),
      "unrelated docs are singleton groups keyed by their own id")
    intercept[IllegalArgumentException] {
      TrainingDataPipeline.splitFrame(fixture, cfg = loose,
        splitJaccard = 0.9) // looser than the dedup threshold: rejected
    }
  }

  test("cluster mode on the real corpus removes at least as much as pairwise") {
    val pairwise = TrainingDataPipeline.curate(docs, cfg = cfg).count()
    val clustered = TrainingDataPipeline.curate(docs,
      cfg = cfg.copy(clusterNearDups = true)).count()
    assert(clustered <= pairwise)
    assert(clustered > 0)
  }

  test("curateAndPack ends in training-ready chunks covering every curated doc") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir)
    val curated = TrainingDataPipeline.curate(docs)
    val chunks = TrainingDataPipeline.curateAndPack(docs, maxTokens = 512)
    val packedIds = chunks.flatMap(_.doc_ids).collect().sorted
    val curatedIds = curated.select($"doc_id").as[Long].collect().sorted
    assert(packedIds.toSeq === curatedIds.toSeq,
      "every curated doc packed exactly once")
    chunks.collect().foreach { c =>
      if (c.n_docs > 1) assert(c.total_tokens <= 512)
    }
  }

  test("boilerplate + Gopher stages compose into curation") {
    import graft.operators.QualityRules
    // 12 docs: enough words to clear the gates, a universal header line,
    // one gibberish doc that fails the stopword gate
    val fx = ((0 until 11).map { i =>
      val body = Seq.fill(20)(Seq("the", "quick", "word" + i, "and", "run")).flatten
      (i.toLong, ("SITE HEADER\n" + body.mkString(" ")))
    } :+ (11L, "SITE HEADER\n" + Seq.fill(100)("zzz").mkString(" ")))
      .toDF("doc_id", "text")
    val cfg = Config(minQuality = 0.0, minTokens = 1,
      allowedLangs = Set("en", "de", "fr", "es", "unk"),
      boilerplate = Some(Config.Boilerplate(sep = "\n", maxDfFrac = 0.5)),
      gopherRules = Some(QualityRules.Config(minWords = 50)))
    val curated = TrainingDataPipeline.curate(fx, cfg = cfg).cache()
    val texts = curated.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(texts.nonEmpty)
    assert(texts.values.forall(!_.contains("SITE HEADER")),
      "header must be stripped before curation output")
    assert(!texts.contains(11L), "stopword-free gibberish must fail the Gopher gate")
    // funnel reflects the same stages
    val f = TrainingDataPipeline.funnel(fx, cfg = cfg)
    assert(f("after_filters") < f("input"))
  }

  test("entry flagship returns rows with the expected shape") {
    val out = SparkEntry.entry(spark)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(out.columns.toSeq === Seq("c_mktsegment", "month", "revenue", "n_orders"))
  }
  test("span-dedup stage cuts repeated passages before annotation; chunking composes") {
    // 10 clean docs + 3 docs sharing a verbatim 12-token passage; loose
    // gates so only the span stage changes anything
    // filler tokens are all distinct WITHIN a doc so nothing self-repeats;
    // sprinkle stopwords so language/quality signals stay sane
    val passage = Seq.tabulate(12)(i => s"dup$i").mkString(" ")
    def filler(tag: String, n: Int): String =
      (0 until n).map(j => if (j % 3 == 0) "the" else s"$tag$j").mkString(" ")
    val fx = ((0 until 10).map { i =>
      (i.toLong, filler(s"word${i}_", 60))
    } ++ (10 until 13).map { i =>
      (i.toLong, filler(s"item${i}_", 40) + " " + passage)
    }).toDF("doc_id", "text")
    val loose = Config(minQuality = -1.0, minTokens = 1,
      allowedLangs = Set("en", "de", "fr", "es", "und", "unk"),
      nearDupJaccard = 0.99,
      spanDedup = Some(Config.SpanDedup(w = 8)))
    val curated = TrainingDataPipeline.curate(fx, cfg = loose).cache()
    val texts = curated.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(texts.keySet.intersect(Set(10L, 11L, 12L)).nonEmpty,
      "span-cut docs survive curation (they are no longer near-dups)")
    assert(texts.filterKeys(_ >= 10L).values.forall(!_.contains("dup0")),
      "the repeated passage must be cut from every carrier")
    assert(texts.filterKeys(_ < 10L).values.forall(_.nonEmpty),
      "clean docs pass through the rewrite untouched")
    // chunking composes downstream of the same curated frame
    val chunks = TrainingDataPipeline.curateAndChunk(fx, cfg = loose,
      chunkSize = 16, stride = 12)
    val byDoc = chunks.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(byDoc.values.forall(_ >= 1L))
    assert(byDoc.keySet === texts.keySet, "every curated doc is chunked")
  }

  test("q77 training flow: per-shard digests are deterministic and partition-invariant") {
    // the composed curate -> budget -> pack -> shard chain must produce
    // bit-identical shard digests regardless of input partitioning — every
    // ordering in the chain keys off md5 buckets, never partition order
    def run(docs: org.apache.spark.sql.DataFrame) = {
      TrainingDataPipeline.shardTrainingSet(docs, "doc_id", "text",
          budgetPerStratum = Some(2000L), maxTokens = 512, nShards = 4,
          bucketHexChars = 1)
        .groupBy($"shard")
        .agg(md5(concat_ws("|", transform(
            array_sort(collect_list(struct($"pos", $"chunk_id", $"doc_ids"))),
            s => concat_ws(":", s("pos").cast("string"), s("chunk_id"), s("doc_ids")))))
          .as("digest"))
        .orderBy($"shard")
        .as[(Int, String)].collect().toSeq
    }
    val docs = graft.core.Tables.documents(spark, sfDir)
    val a = run(docs)
    val b = run(docs.repartition(13, $"source"))
    assert(a.nonEmpty, "the chain must emit at least one shard")
    assert(a === b, "shard digests must not depend on input partitioning")
  }
}
