package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** The canonical LLM training-data curation pipeline, composed from the
  * north-star operators: annotate → quality/language filter → exact dedup →
  * near-dup removal (MinHash+LSH) → token accounting.
  *
  * One declarative flow: every stage is a DataFrame transform, so Catalyst
  * fuses the row-local annotation/filter stages into the scan and the only
  * shuffles are the two dedup stages (digest groupBy + LSH banding) — at
  * 100 TB this runs as: one annotated scan, one narrow filter, two bounded
  * shuffles.
  */
object TrainingDataPipeline {

  final case class Config(
      minQuality: Double = 0.3,
      allowedLangs: Set[String] = Set("en", "de", "fr", "es"),
      minTokens: Int = 5,
      nearDupJaccard: Double = 0.8,
      shingleSize: Int = 3)

  /** Curated corpus: annotation columns added, low-quality / wrong-language
    * / short docs removed, exact and near duplicates dropped keeping the
    * smallest doc_id per duplicate group. */
  def curate(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", cfg: Config = Config()): DataFrame = {
    // 1. row-local annotation (fused into the scan by Catalyst)
    val annotated = TextFunctions.withLangId(docs, textCol, "pred_lang")
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)))

    // 2. narrow filters
    val filtered = annotated.filter(
      col("quality") >= cfg.minQuality &&
        col("pred_lang").isin(cfg.allowedLangs.toSeq: _*) &&
        col("n_tokens") >= cfg.minTokens)

    // 3. exact dedup (digest groupBy, min id wins)
    val exact = Dedup.exactDedup(filtered, idCol, textCol)

    // 4. near-dup removal: MinHash candidates verified by exact Jaccard;
    //    from each surviving pair drop the larger id (keep canonical min)
    val nearDupLosers = Dedup.minhashNearDupPairs(exact, idCol, textCol,
        n = cfg.shingleSize, minJac = cfg.nearDupJaccard)
      .select(col("id_b").as(idCol)).distinct()
    exact.join(nearDupLosers, Seq(idCol), "left_anti")
  }

  /** Per-stage row accounting — the curation funnel report. */
  def funnel(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", cfg: Config = Config()): Map[String, Long] = {
    val annotated = TextFunctions.withLangId(docs, textCol, "pred_lang")
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)))
    val filtered = annotated.filter(
      col("quality") >= cfg.minQuality &&
        col("pred_lang").isin(cfg.allowedLangs.toSeq: _*) &&
        col("n_tokens") >= cfg.minTokens)
    val exact = Dedup.exactDedup(filtered, idCol, textCol)
    val curated = curate(docs, idCol, textCol, cfg)
    Map(
      "input" -> docs.count(),
      "after_filters" -> filtered.count(),
      "after_exact_dedup" -> exact.count(),
      "after_near_dedup" -> curated.count())
  }
}
