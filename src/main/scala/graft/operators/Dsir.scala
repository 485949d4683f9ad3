package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.expressions.ShingleHashes.gram_hashes
import graft.queries.Exact

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling" —
  * public): fit cheap bag-of-hashed-ngram models on a TARGET corpus (the
  * distribution you want more of — wikipedia-grade text, a domain slice)
  * and on the RAW corpus being filtered, weigh every raw document by its
  * log importance ratio log p_target(doc) − log p_raw(doc), and keep the
  * top fraction (or Gumbel-resample on the weights). The modern
  * curation move when hard quality gates are too blunt: documents that
  * LOOK like the target rank up, boilerplate and off-domain text rank
  * down, and the whole thing costs two count aggregates plus a scoring
  * pass — no classifier training, no inference fleet.
  *
  * Model: add-k-smoothed unigram bags over hashed tokens,
  * p(w) = (c(w) + k) / (n + k·V), with V the RAW corpus vocabulary (a
  * superset of the target's in any real corpus; one shared V keeps the
  * two models on one smoothing scale). The importance weight of a doc is
  * Σ_tokens [ln p_T(w) − ln p_R(w)] — [[NgramLm]]'s machinery pointed at
  * two corpora and differenced.
  *
  * Scale shape (the [[NgramLm]] contract): [[fit]] is two map-side-
  * combined count aggregates over 8-byte token HASHES — no token string
  * is ever materialized or shuffled; [[weigh]] explodes each doc's token
  * hashes and left-joins the two (bounded, broadcast) count tables, then
  * reduces per doc with an order-independent exact-decimal sum
  * ([[graft.queries.Exact.dsum]]) so the weight is bit-identical across
  * partitionings and engines. Selection composes with
  * [[Sampling.topFractionByScore]] (prefix-histogram plan, no global
  * sort) on `sum_logratio / n_tokens`.
  *
  * Hash collisions merge two tokens' counts (~1e-15 per pair, the
  * standard hashed-gram caveat); the q109 oracle compares against
  * string-keyed counts and would surface one.
  */
object Dsir {

  /** Fitted importance model: per-token-hash counts for both corpora,
    * their total token counts, the shared vocabulary size, and the
    * smoothing constant. Both count frames are cached ([[NgramLm]]'s
    * cache contract: callers clear with spark.catalog.clearCache). */
  final case class DsirModel(targetCounts: DataFrame, rawCounts: DataFrame,
      nTarget: Long, nRaw: Long, vocabSize: Long, addK: Double)

  def fit(target: DataFrame, raw: DataFrame, textCol: String,
      addK: Double = 0.5): DsirModel = {
    require(addK > 0.0, s"addK must be > 0, got $addK")
    def unigramCounts(corpus: DataFrame, as: String): DataFrame = corpus
      .select(explode(gram_hashes(TextFunctions.tokens(col(textCol)), 1)).as("w1h"))
      .groupBy("w1h").agg(count(lit(1)).as(as))
      .cache()
    val t = unigramCounts(target, "ct")
    val r = unigramCounts(raw, "cr")
    val nT = t.agg(coalesce(sum(col("ct")), lit(0L))).head().getLong(0)
    val nR = r.agg(coalesce(sum(col("cr")), lit(0L))).head().getLong(0)
    val v = r.count() // the raw corpus vocabulary — one count over the agg
    DsirModel(t, r, nT, nR, v, addK)
  }

  /** Per-document importance weight: (idCol, n_tokens, sum_logratio)
    * where sum_logratio = Σ_tokens [ln p_T(w) − ln p_R(w)] through the
    * exact-decimal sum. Docs with zero tokens carry no signal and drop
    * (same contract as [[NgramLm.score]]). Positive = target-like,
    * negative = raw-typical; rank by sum_logratio / n_tokens. */
  def weigh(docs: DataFrame, idCol: String, textCol: String,
      model: DsirModel): DataFrame = {
    val k = model.addK
    // denominators precomputed as scalars, multiply-then-add, so the
    // engine and the string-keyed oracle evaluate the same IEEE ops
    val denomT = model.nTarget + k * model.vocabSize
    val denomR = model.nRaw + k * model.vocabSize
    docs
      .select(col(idCol),
        explode(gram_hashes(TextFunctions.tokens(col(textCol)), 1)).as("w1h"))
      .join(broadcast(model.targetCounts), Seq("w1h"), "left")
      .join(broadcast(model.rawCounts), Seq("w1h"), "left")
      .withColumn("lp",
        log((coalesce(col("ct"), lit(0L)) + k) / lit(denomT)) -
          log((coalesce(col("cr"), lit(0L)) + k) / lit(denomR)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        Exact.dsum(col("lp"), 18, 6).as("sum_logratio"))
  }

  /** fit + weigh in one call. */
  def weighAgainst(docs: DataFrame, target: DataFrame, idCol: String,
      textCol: String, addK: Double = 0.5): DataFrame =
    weigh(docs, idCol, textCol, fit(target, docs, textCol, addK))
}
