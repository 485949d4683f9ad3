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
      shingleSize: Int = 3,
      /** false = pairwise rule (keep local minima — see [[dropNearDups]]);
        * true = one keeper per TRANSITIVE near-dup cluster via connected
        * components — strictly more removals, the conventional choice when
        * duplicate clusters are the contamination risk. */
      clusterNearDups: Boolean = false,
      /** When set, corpus-frequency boilerplate segments (split on
        * `sep`, document frequency above `maxDfFrac`) are stripped from
        * every document BEFORE annotation — quality/language signals then
        * score the prose, not the site chrome. */
      boilerplate: Option[Config.Boilerplate] = None,
      /** When set, the Gopher hard gates (integer-exact rule arithmetic)
        * apply alongside the soft quality threshold. */
      gopherRules: Option[graft.operators.QualityRules.Config] = None,
      /** When set, corpus-repeated token spans (Lee et al.; w-shingles
        * occurring >= minCount times) are cut from every document after
        * boilerplate removal and before annotation — repeated passages
        * are gone before quality/language signals score the text. */
      spanDedup: Option[Config.SpanDedup] = None)

  object Config {
    final case class Boilerplate(sep: String = "\n", maxDfFrac: Double = 0.02)
    final case class SpanDedup(w: Int = 8, minCount: Long = 2L)
  }

  /** Annotation + filter + exact-dedup stages, shared by curate, funnel,
    * and ledger so the reported accounting can never diverge from the
    * executed pipeline. Returns (annotated, filtered, exact); `exact` is
    * cached: three downstream subplans consume it (minhash signatures,
    * verification shingles, the final anti-join). */
  private def stages(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config): (DataFrame, DataFrame, DataFrame) = {
    val deboiled = cfg.boilerplate.fold(docs)(b =>
      Dedup.dropCommonSegments(docs, idCol, textCol,
        sep = b.sep, maxDfFrac = b.maxDfFrac).drop("n_removed"))
    val despanned = cfg.spanDedup.fold(deboiled) { s =>
      // the rewrite carries only (id, text); rejoin the other columns by id
      val rewritten = graft.operators.SpanDedup.removeRepeatedSpans(
          deboiled, idCol, textCol, s.w, s.minCount)
        .select(col(idCol), col(textCol))
      deboiled.drop(textCol).join(rewritten, Seq(idCol))
    }
    val annotated = TextFunctions.withLangId(despanned, textCol, "pred_lang")
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)))
    val softFiltered = annotated.filter(
      col("quality") >= cfg.minQuality &&
        col("pred_lang").isin(cfg.allowedLangs.toSeq: _*) &&
        col("n_tokens") >= cfg.minTokens)
    // pure-predicate form: filters without touching (or shadowing) the
    // annotation columns the caller's frame may already carry
    val filtered = cfg.gopherRules.fold(softFiltered)(g =>
      graft.operators.QualityRules.apply(softFiltered, textCol, g))
    // narrow variant: corpus ids are unique by contract here, so the dedup
    // exchanges move 24-byte digest+id rows, never the document text
    val exact = Dedup.exactDedupNarrow(filtered, idCol, textCol).cache()
    (annotated, filtered, exact)
  }

  /** Near-dup removal rule: drop a doc iff it has a verified near-duplicate
    * with a SMALLER id. This keeps every "local minimum" — strictly fewer
    * removals than connected-component dedup (which keeps one doc per
    * transitive cluster; opt in via Config.clusterNearDups, built on
    * operators.Components) while still guaranteeing no surviving pair is
    * within the threshold of each other... except across removed
    * intermediaries: in a chain 1~2~3 (1 !~ 3), doc 2 and 3 both drop even
    * though 3's only near-dup was itself removed. That bias toward removal
    * is deliberate — duplicate-cluster members are the risk in training
    * data, and the alternative (maximum independent set) is not computable
    * in a bounded number of distributed passes. */
  private def dropNearDups(exact: DataFrame, idCol: String, textCol: String,
      cfg: Config): DataFrame = {
    val pairs = Dedup.minhashNearDupPairs(exact, idCol, textCol,
      n = cfg.shingleSize, minJac = cfg.nearDupJaccard)
    val losers =
      if (cfg.clusterNearDups)
        // one keeper (minimum id) per transitive cluster: everything whose
        // component label isn't itself goes. Chain 1~2~3 keeps only 1;
        // the pairwise rule below would keep 1 and any other local minimum.
        graft.operators.Components.connectedComponents(pairs, "id_a", "id_b")
          .filter(col("node") =!= col("component"))
          .select(col("node").as(idCol))
      else
        pairs.select(col("id_b").as(idCol)).distinct()
    exact.join(losers, Seq(idCol), "left_anti")
  }

  /** Curated corpus: annotation columns added, low-quality / wrong-language
    * / short docs removed, exact duplicates keep the smallest id, near
    * duplicates removed per the [[dropNearDups]] rule. */
  def curate(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", cfg: Config = Config()): DataFrame = {
    val (_, _, exact) = stages(docs, idCol, textCol, cfg)
    dropNearDups(exact, idCol, textCol, cfg)
  }

  /** The full preprocessing story: curate (filter → dedup → near-dup
    * removal) then pack the survivors into training-ready chunks of at
    * most `maxTokens`. Chunks carry doc ids; gather text by joining back
    * to the curated frame. */
  def curateAndPack(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", cfg: Config = Config(),
      maxTokens: Int = 2048): org.apache.spark.sql.Dataset[graft.operators.Packing.PackedChunk] =
    graft.operators.Packing.packDocuments(
      curate(docs, idCol, textCol, cfg), idCol, textCol, maxTokens)

  /** Curate, then cut the survivors into overlapping context windows
    * instead of packed chunks — the two tokenizer-feed shapes; pick
    * packing for throughput training, chunking for long-document
    * coverage with overlap. */
  def curateAndChunk(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", cfg: Config = Config(),
      chunkSize: Int = 2048, stride: Int = 2048): DataFrame =
    graft.operators.Packing.chunkTokens(
      curate(docs, idCol, textCol, cfg), idCol, textCol, chunkSize, stride)

  /** The FULL training-data flow as one declarative chain: [[curate]] →
    * per-stratum token-budget cap → greedy sequence packing → deterministic
    * shard shuffle. Returns the sharded chunk manifest
    * (chunk_id, total_tokens, doc_ids, shard, pos): reading chunks in
    * (shard, pos) order visits the packed corpus in a fixed pseudo-random
    * permutation; join doc_ids back to the curated frame to gather text,
    * or hand the manifest to [[graft.operators.Sampling.writeShards]]-style
    * materialization. q77 pins this exact composition (with a per-shard
    * content digest) against a four-stage relational replay.
    *
    * Scale shape: inherits each stage's own (one annotated scan + two
    * bounded dedup shuffles; prefix-histogram budget — no per-stratum
    * global sort; per-bucket packing; nShards-way exchange with per-shard
    * rank) — the composition adds NO new shuffle class.
    *
    * @param budgetPerStratum max token mass each `stratumCol` value
    *                         contributes, in deterministic hash-priority
    *                         order (None = keep everything)
    * @param maxTokens        packed-chunk capacity
    * @param nShards          training shards; size so one shard ≈ one task */
  def shardTrainingSet(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", cfg: Config = Config(),
      stratumCol: String = "source", budgetPerStratum: Option[Long] = None,
      maxTokens: Int = 2048, nShards: Int = 64,
      bucketHexChars: Int = 2): DataFrame = {
    val curated = curate(docs, idCol, textCol, cfg)
    val budgeted = budgetPerStratum.fold(curated)(b =>
      graft.operators.Sampling.tokenBudgetSample(
        curated, idCol, "n_tokens", stratumCol, b))
    val packed = graft.operators.Packing.packGreedy(
        budgeted.withColumn("n_tokens", col("n_tokens").cast("long")),
        idCol, "n_tokens", maxTokens, bucketHexChars)
      .toDF()
      .select(col("chunk_id"), col("total_tokens"),
        concat_ws(",", transform(sort_array(col("doc_ids")), _.cast("string")))
          .as("doc_ids"))
    graft.operators.Sampling.shuffleShards(packed, "chunk_id", nShards)
  }

  /** Per-stage row accounting — the curation funnel report. Shares the
    * stage frames with [[curate]] (cached where fanned out), so one call
    * costs one annotated scan plus the two dedup shuffles. */
  def funnel(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", cfg: Config = Config()): Map[String, Long] = {
    val (_, filtered, exact) = stages(docs, idCol, textCol, cfg)
    Map(
      "input" -> docs.count(),
      "after_filters" -> filtered.count(),
      "after_exact_dedup" -> exact.count(),
      "after_near_dedup" -> dropNearDups(exact, idCol, textCol, cfg).count())
  }

  /** The funnel as ONE declarative frame of (ord, stage, n) rows — the
    * report a long-running curation job materializes per partition/day
    * instead of issuing four driver-side counts: a union of count
    * aggregates over the shared stage frames, so the whole funnel is one
    * job whose only full-data pass is the annotated scan (the later
    * stages reuse the cached exact frame). q76 pins it relationally. */
  def funnelFrame(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", cfg: Config = Config()): DataFrame = {
    val (_, filtered, exact) = stages(docs, idCol, textCol, cfg)
    val kept = dropNearDups(exact, idCol, textCol, cfg)
    def stage(ord: Int, name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n"))
        .select(lit(ord).as("ord"), lit(name).as("stage"), col("n"))
    stage(1, "input", docs)
      .unionByName(stage(2, "after_filters", filtered))
      .unionByName(stage(3, "after_exact_dedup", exact))
      .unionByName(stage(4, "after_near_dedup", kept))
  }

  /** Per-document drop ledger — [[funnelFrame]]'s counts exploded to the
    * row level: one (id, reason) row per INPUT document with the
    * first-failure-wins reason in pipeline order (`lang_filter` →
    * `quality` → `min_tokens` → `gopher_quality` → `exact_dup` →
    * `near_dup` → `kept`), so a 100 TB curation run can audit why any
    * individual document was cut without re-running the pipeline stage
    * by stage. Same rewrite + annotation chain and the same cached
    * `exact` frame as [[curate]] (the ledger can never diverge from the
    * executed pipeline); grouping by reason reproduces the funnel
    * deltas exactly (TrainingDataPipelineSpec pins both, and pins the
    * composition against q224's standalone ledger query).
    *
    * Scale shape: the filter verdicts are row-local columns computed
    * BEFORE the dedup window, so the digest exchange moves (id, digest,
    * four booleans) — never text; the exact-dup rank is the q224
    * per-digest cumulative-survivor window; the near-dup leg joins two
    * id-only frames. No new shuffle class over [[curate]] itself. */
  /** Leakage-safe train/val/test assignment over the CURATED corpus —
    * [[graft.operators.Sampling.leakageSafeSplit]] wired into the
    * pipeline with the piece a plain post-curation split misses:
    * curation only REMOVES pairs at ≥ `cfg.nearDupJaccard`, so documents
    * related at [`splitJaccard`, nearDupJaccard) BOTH survive and a
    * row-wise split can strand a paraphrase of a training document in
    * the eval set. This runs a SECOND, looser pair pass at
    * `splitJaccard` over the survivors and keys the assignment on those
    * components, so related-but-not-duplicate documents co-locate.
    *
    * Recall caveat, stated rather than hidden: the MinHash band screen's
    * hit rate falls with similarity ((j^(k/bands))·bands-ish), so pairs
    * near a LOW splitJaccard may be missed; verification is exact, so
    * every surfaced pair is real. For strict guarantees at low
    * thresholds raise `bands` via a custom pair frame and call
    * [[graft.operators.Sampling.leakageSafeSplit]] directly.
    *
    * Output: the curated frame plus (group_key, split). No new shuffle
    * class over curate + one near-dup pass + one id-keyed join. */
  def splitFrame(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", cfg: Config = Config(),
      salt: String = "split:",
      weights: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      splitJaccard: Double = 0.3): DataFrame = {
    require(splitJaccard > 0.0 && splitJaccard <= cfg.nearDupJaccard,
      s"splitJaccard ($splitJaccard) must be in (0, nearDupJaccard=" +
        s"${cfg.nearDupJaccard}]: the split guard must be at least as " +
        "inclusive as the dedup that already removed closer pairs")
    val curated = curate(docs, idCol, textCol, cfg)
    val pairs = Dedup.minhashNearDupPairs(curated, idCol, textCol,
      n = cfg.shingleSize, minJac = splitJaccard)
    graft.operators.Sampling.leakageSafeSplit(curated, idCol, pairs,
      "id_a", "id_b", salt, weights)
  }

  def ledgerFrame(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", cfg: Config = Config()): DataFrame = {
    val (annotated, _, exact) = stages(docs, idCol, textCol, cfg)
    val gopherOk = cfg.gopherRules.fold(lit(true))(g =>
      graft.operators.QualityRules.passes(textCol, g))
    val flagged = annotated.select(col(idCol),
      md5(col(textCol)).as("__h"),
      col("pred_lang").isin(cfg.allowedLangs.toSeq: _*).as("__lang"),
      (col("quality") >= cfg.minQuality).as("__q"),
      (col("n_tokens") >= cfg.minTokens).as("__t"),
      gopherOk.as("__g"))
    val pass = col("__lang") && col("__q") && col("__t") && col("__g")
    val wH = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    // the near-dup survivors, as an id-only membership marker: a filter
    // survivor that is its digest's keeper but absent here lost the
    // near-dup stage (exactly curate's final anti-join, inverted)
    val keptIds = dropNearDups(exact, idCol, textCol, cfg)
      .select(col(idCol), lit(true).as("__kept"))
    flagged
      .withColumn("__surv_rank",
        sum(when(pass, 1L).otherwise(0L)).over(wH))
      .join(keptIds, Seq(idCol), "left")
      .select(col(idCol),
        when(!col("__lang"), lit("lang_filter"))
          .when(!col("__q"), lit("quality"))
          .when(!col("__t"), lit("min_tokens"))
          .when(!col("__g"), lit("gopher_quality"))
          .when(col("__surv_rank") > 1, lit("exact_dup"))
          .when(col("__kept").isNull, lit("near_dup"))
          .otherwise(lit("kept")).as("reason"))
  }
}
