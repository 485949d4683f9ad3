package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Gopher-style document quality rules (Rae et al. 2021 §A1.1, public):
  * the standard structural filters a corpus passes before training —
  * word-count bounds, mean-word-length bounds, alphabetic-word fraction,
  * and a minimum stopword count (the "does this even look like prose"
  * signal). Complements [[graft.functions.TextFunctions.qualityScore]]
  * (a soft score) with hard pass/fail gates, and [[NgramLm]] (a model-
  * based signal) with model-free ones.
  *
  * Everything is a narrow per-row map over higher-order functions — no
  * shuffle, no state, fuses into the scan.
  *
  * Rule arithmetic is INTEGER-exact by design: thresholds evaluate as
  * cross-multiplied integer comparisons (mean length in [lo, hi] ⇔
  * lo·n ≤ Σlen ≤ hi·n; alpha fraction ≥ p% ⇔ 100·n_alpha ≥ p·n), so the
  * pass flag is bit-reproducible on any engine — no float division, no
  * rounding boundary (the q56 lesson applied preemptively). */
object QualityRules {

  /** Thresholds follow Gopher's published values except where the rule
    * needs a tokenizer we don't impose (symbol ratios); fractions are
    * integer percents to keep rule evaluation exact. */
  final case class Config(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Int = 3,
      maxMeanWordLen: Int = 10,
      minAlphaPct: Int = 80,
      minStopwords: Int = 2,
      stopwords: Seq[String] =
        Seq("the", "a", "and", "of", "to", "in", "be", "that", "have", "with"))

  private def counts(textCol: String, cfg: Config) = {
    val toks = TextFunctions.tokens(col(textCol))
    val nWords = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, w) => acc + length(w))
    val nAlpha = size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("long")
    val stopLit = array(cfg.stopwords.map(lit): _*)
    val nStop = size(filter(toks, w => array_contains(stopLit, w))).cast("long")
    (nWords, sumLen, nAlpha, nStop)
  }

  /** The combined gate as a single Column over `textCol` — usable in any
    * filter without touching the frame's schema. */
  def passes(textCol: String, cfg: Config = Config()): Column = {
    val (nWords, sumLen, nAlpha, nStop) = counts(textCol, cfg)
    nWords.between(cfg.minWords, cfg.maxWords) &&
      (sumLen >= nWords * cfg.minMeanWordLen) &&
      (sumLen <= nWords * cfg.maxMeanWordLen) &&
      (nAlpha * 100 >= nWords * cfg.minAlphaPct) &&
      (nStop >= cfg.minStopwords)
  }

  /** Adds n_words, sum_word_len, n_alpha_words, n_stopwords, gopher_pass
    * (REPLACING same-named columns if the frame already carries them —
    * pass survivors-only via [[apply]] to keep a schema untouched).
    * Filter survivors with `.filter(col("gopher_pass"))` or [[apply]]. */
  def annotate(docs: DataFrame, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val (nWords, sumLen, nAlpha, nStop) = counts(textCol, cfg)
    docs
      .withColumn("n_words", nWords)
      .withColumn("sum_word_len", sumLen)
      .withColumn("n_alpha_words", nAlpha)
      .withColumn("n_stopwords", nStop)
      .withColumn("gopher_pass", passes(textCol, cfg))
  }

  /** Survivors only, schema and column VALUES untouched — a pure filter
    * on [[passes]], so a frame that already carries columns named like
    * the annotations keeps its own values (annotate+select would
    * silently recompute them). */
  def apply(docs: DataFrame, textCol: String,
      cfg: Config = Config()): DataFrame =
    docs.filter(passes(textCol, cfg))
}
