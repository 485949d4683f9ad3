package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.expressions.ShingleHashes.gram_hashes
import graft.queries.Exact

/** Add-k-smoothed bigram language model for corpus quality scoring — the
  * CCNet-style signal: fit a cheap LM on a trusted reference corpus
  * (wikipedia-grade text), score every candidate document by its average
  * bigram log-probability, and filter/bucket on the score. Documents that
  * look nothing like the reference (wrong language, boilerplate soup,
  * gibberish) sit far below the reference's own range.
  *
  * Model: p(w2|w1) = (c(w1 w2) + k) / (c(w1) + k * V), V = reference
  * unigram vocabulary size — textbook add-k smoothing, so out-of-
  * vocabulary bigrams degrade gracefully instead of zeroing the product.
  *
  * Scale shape:
  *  - [[fit]] is two map-side-combined count aggregates over 8-byte gram
  *    HASHES (graft.functions.expressions.ShingleHashes — no n-gram string
  *    is ever materialized, mirroring the dedup operators) plus one
  *    distinct-count for V.
  *  - [[score]] explodes each doc's (w1-hash, bigram-hash) pairs — built
  *    row-locally by zipping the doc's own gram arrays — and left-joins
  *    the two model tables. The model is broadcast here (reference
  *    vocabularies are bounded); for a web-scale reference drop the hint
  *    and the join degrades to hash-shuffle on the 8-byte key.
  *  - per-doc aggregation routes the log-prob sum through exact decimal
  *    arithmetic ([[Exact.dsum]]) so the score is independent of
  *    accumulation order — reproducible across partitionings and engines.
  *
  * Hash collisions merge two grams' counts (~1e-15 per pair, the standard
  * caveat of the hashed-gram family; the q56 oracle compares against
  * string-keyed counts and would surface one).
  */
object NgramLm {

  /** Fitted model: unigram counts (w1h, c1), bigram counts (bh, c2),
    * vocabulary size, smoothing constant. */
  final case class LmModel(unigrams: DataFrame, bigrams: DataFrame,
      vocabSize: Long, addK: Double)

  def fit(reference: DataFrame, textCol: String, addK: Double = 0.5): LmModel = {
    require(addK > 0.0, s"addK must be > 0, got $addK")
    val toks = TextFunctions.tokens(col(textCol))
    // cache both model tables: V's count materializes the unigram agg, and
    // score consumes each table again as a broadcast side — uncached, the
    // raw reference would be scanned and re-aggregated per use (Dedup's
    // cache contract: callers clear with spark.catalog.clearCache)
    val uni = reference
      .select(explode(gram_hashes(toks, 1)).as("w1h"))
      .groupBy("w1h").agg(count(lit(1)).as("c1"))
      .cache()
    val bi = reference
      .select(explode(gram_hashes(toks, 2)).as("bh"))
      .groupBy("bh").agg(count(lit(1)).as("c2"))
      .cache()
    val v = uni.count() // one count over the (bounded) vocabulary aggregate
    LmModel(uni, bi, v, addK)
  }

  /** Per-document average bigram log-probability under the model:
    * (idCol, n_bigrams, avg_logprob). Documents with fewer than two
    * tokens have no bigram and are dropped (they carry no signal). */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: LmModel): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val u = gram_hashes(toks, 1)
    val b = gram_hashes(toks, 2)
    // row-local pairing: bigram i starts at token i, so zipping the
    // (L-1)-prefix of the unigram hashes with the bigram hashes aligns
    // each bigram with its context word
    val pairs = zip_with(slice(u, lit(1), size(b)), b,
      (x, y) => struct(x.as("w1h"), y.as("bh")))
    val exploded = docs
      .select(col(idCol), explode(pairs).as("p"))
      .select(col(idCol), col("p.w1h").as("w1h"), col("p.bh").as("bh"))
    val k = model.addK
    val scored = exploded
      .join(broadcast(model.bigrams), Seq("bh"), "left")
      .join(broadcast(model.unigrams), Seq("w1h"), "left")
      .withColumn("lp", log(
        (coalesce(col("c2"), lit(0L)) + k) /
          (coalesce(col("c1"), lit(0L)) + k * model.vocabSize)))
    // sum_logprob is the exactly-reproducible quantity (order-independent
    // decimal sum); avg_logprob divides it per-doc for human consumption —
    // cross-engine hash checks should compare the sum (q56 does: an
    // average this close to a round() half-boundary can round differently
    // across engines even when the underlying sum is bit-identical)
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        Exact.dsum(col("lp"), 18, 6).as("sum_logprob"))
      .withColumn("avg_logprob",
        round(col("sum_logprob") / col("n_bigrams"), 6))
  }

  /** fit + score in one call (reference and target may differ). */
  def scoreAgainst(docs: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, addK: Double = 0.5): DataFrame =
    score(docs, idCol, textCol, fit(reference, textCol, addK))
}
