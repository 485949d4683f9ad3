package graft

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

  test("entry flagship returns rows with the expected shape") {
    val out = SparkEntry.entry(spark)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(out.columns.toSeq === Seq("c_mktsegment", "month", "revenue", "n_orders"))
  }
}
