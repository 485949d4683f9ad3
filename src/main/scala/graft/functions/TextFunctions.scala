package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, document fingerprinting.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs): higher-order array functions keep the work inside whole-stage
  * codegen, so these run at scan speed over 100 TB of documents.
  */
object TextFunctions {

  /** Whitespace tokenizer (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word-piece regex splits on non-alnum boundaries
    * and digit runs, approximating byte-pair token inflation. */
  def subwordCount(text: Column): Column =
    // split keeps empty strings at leading/trailing delimiter boundaries;
    // they are not tokens
    size(filter(
      split(text, "[^\\p{L}\\p{N}]+|(?<=\\p{L})(?=\\p{N})|(?<=\\p{N})(?=\\p{L})"),
      w => length(w) > 0))

  /** Count of tokens present in `words`. */
  def tokenHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), w => w.isin(words: _*)))

  /** Small function-word lists per language for the n-gram/stopword
    * language-ID heuristic. Deterministic, dictionary-free. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une"),
    "es" -> Seq("el", "la", "y", "los", "de", "es", "una"))

  /** Stopword-hit ratio against the English list (quality signal).
    * tokenCount is >= 1 for any non-null text (split("") = [""]), so the
    * division is total; null text propagates null, as everywhere. */
  def stopwordRatio(text: Column): Column =
    tokenHits(text, stopwords("en")).cast("double") / tokenCount(text)

  /** Punctuation-character ratio (quality signal). The length guard is
    * live: empty documents exist in any wild corpus (and the span-dedup
    * rewrite can empty one), and under ANSI mode an unguarded x/0 kills
    * the job. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
          length(text))

  /** Mean token length in characters (quality signal); total like
    * [[stopwordRatio]]. */
  def meanTokenLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / tokenCount(text)

  /** Composite document quality score in [0, ~1]: rewards function-word
    * density and typical word lengths, penalizes punctuation noise.
    * All double arithmetic is row-local → deterministic across engines. */
  def qualityScore(text: Column): Column =
    least(stopwordRatio(text) * 4.0, lit(1.0)) * 0.4 +
      least(meanTokenLen(text) / 8.0, lit(1.0)) * 0.4 +
      (lit(1.0) - least(punctRatio(text) * 10.0, lit(1.0))) * 0.2

  /** Language-ID: score each language's function-word list, take the argmax
    * (ties broken by fixed language order), 'und' (undetermined) if no hits.
    *
    * Single-expression form — fine for one-off use, but it inlines the
    * tokenizer into every score; prefer [[withLangId]] in pipelines. */
  def langId(text: Column): Column = {
    val scores = Seq("en", "de", "fr", "es").map(l => l -> tokenHits(text, stopwords(l)))
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Staged language-ID: tokenization and per-language scores materialize as
    * intermediate projections so the tokenizer runs ONCE per row instead of
    * once per score reference (CollapseProject keeps multi-referenced
    * non-cheap aliases staged). ~10x over [[langId]] on wide score sets. */
  def withLangId(df: org.apache.spark.sql.DataFrame, textCol: String,
      out: String = "pred_lang"): org.apache.spark.sql.DataFrame = {
    val langs = stopwords.keys.toSeq.sorted // deterministic: de, en, es, fr
    val tokenized = df.withColumn("__toks", tokens(col(textCol)))
    val scored = langs.foldLeft(tokenized) { (d, l) =>
      d.withColumn(s"__s_$l",
        size(filter(col("__toks"), w => w.isin(stopwords(l): _*))))
    }
    val withBest = scored.withColumn("__best",
      greatest(langs.map(l => col(s"__s_$l")): _*))
    // argmax with the same fixed priority order as langId: en, de, fr, es
    val pred = Seq("en", "de", "fr", "es").foldRight(lit("und")) { (l, acc) =>
      when(col(s"__s_$l") === col("__best") && col("__best") > 0, lit(l)).otherwise(acc)
    }
    withBest.withColumn(out, pred)
      .drop(("__toks" +: "__best" +: langs.map(l => s"__s_$l")): _*)
  }

  /** Fraction of characters in the CJK Unified Ideographs block — the
    * script signal the stopword heuristic is blind to (CJK text has no
    * space-separated stopwords to hit, so [[langId]] returns "und"). */
  def cjkRatio(text: Column): Column =
    length(regexp_replace(text, "[^一-鿿]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Two-signal language ID: script ratio first (CJK → "zh"), stopword
    * hits otherwise. Layered rather than blended so each signal stays
    * individually SQL-mirrorable for the oracle. */
  def langIdScript(text: Column, cjkThreshold: Double = 0.3): Column =
    when(cjkRatio(text) >= cjkThreshold, lit("zh")).otherwise(langId(text))

  /** Order/multiplicity-insensitive content fingerprint: md5 over the sorted
    * distinct token set. Groups permuted / lightly-edited duplicates. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Canonical text normalization for dedup/fingerprint pipelines: Unicode
    * NFC (composed forms — "é" as one code point), lowercase, whitespace
    * runs collapsed to single spaces, ends trimmed. Apply BEFORE hashing /
    * shingling so encoding and casing variants of the same content
    * collide. NFC rather than NFKC — see
    * [[graft.functions.expressions.TextExpressions.nfc_normalize]].
    * Engine-portable chain: DuckDB `nfc_normalize` + `lower` +
    * `regexp_replace(..., 'g')` + `trim` mirror each step (`\s` is in the
    * Java∩RE2 dialect the Scrub rules already rely on). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      lower(graft.functions.expressions.TextExpressions.nfc_normalize(text)),
      "\\s+", " "))

  /** Sentence segmentation: split on runs of terminal punctuation
    * (`[.!?]+`), trim each segment, drop empties. Deliberately the
    * simplest deterministic contract — abbreviation/decimal-point
    * awareness needs a language model and is out of scope; what matters
    * for corpus curation is that the SAME rule runs on 100 TB and in the
    * oracle. Engine-portable: Spark `split` keeps trailing empty segments
    * (limit -1) and DuckDB `regexp_split_to_array` does too, and both are
    * filtered; `trim` strips spaces in both. Row-local higher-order
    * functions — whole-stage codegen, no shuffle, the raw text never
    * leaves its partition. */
  def sentences(text: Column): Column =
    filter(transform(split(text, "[.!?]+"), s => trim(s)),
      s => length(s) > 0)

  /** Number of sentences under the [[sentences]] contract. */
  def sentenceCount(text: Column): Column = size(sentences(text))

  /** Per-sentence character-length array (trimmed lengths) — the input
    * to mean/min/max sentence-length quality signals (short mean sentence
    * length is a strong boilerplate/listing indicator; cf. Gopher's
    * document-shape rules). */
  def sentenceLens(text: Column): Column =
    transform(sentences(text), s => length(s).cast("long"))

  /** Heuristic syllable count: per word, the number of vowel-group runs
    * (`[aeiouy]+`), floored at 1 (a vowel-less token still carries one
    * spoken beat). The standard readability-formula approximation — exact
    * syllabification needs a dictionary; what matters at corpus scale is
    * a DETERMINISTIC rule both engines replay. Row-local higher-order
    * functions over the token array; no shuffle. */
  def syllableCount(text: Column): Column =
    aggregate(
      transform(tokens(lower(text)),
        w => greatest(size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))),
          lit(1)).cast("long")),
      lit(0L), (acc, s) => acc + s)

  /** Homoglyph skeleton: fold the common Cyrillic/Greek lookalike code
    * points onto their Latin confusables (Unicode TR39's skeleton idea,
    * restricted to a fixed high-frequency table so the mapping is a pure
    * 1:1 `translate` both engines share). Apply before hashing/shingling:
    * a scraped or adversarial document that swaps 'а' (U+0430) for 'a'
    * otherwise evades every exact and shingle dedup while reading
    * identically to a human — the classic dedup/decontamination evasion.
    * Composable with [[normalizeText]] (NFC first, then skeleton). */
  // the spec pins each FROM char's code point (HomoglyphSpec), so an
  // editor/encoding step that silently substituted a Latin twin — turning
  // the mapping into a no-op — cannot survive the suite
  private val homoglyphPairs: Seq[(Char, Char)] = Seq(
    // Cyrillic lowercase а е о р с х у і ѕ ј һ
    'а' -> 'a', 'е' -> 'e', 'о' -> 'o', 'р' -> 'p',
    'с' -> 'c', 'х' -> 'x', 'у' -> 'y', 'і' -> 'i',
    'ѕ' -> 's', 'ј' -> 'j', 'һ' -> 'h',
    // Greek omicron ο
    'ο' -> 'o',
    // Greek uppercase Α Β Ε Η Ι Κ Μ Ν Ο Ρ Τ
    'Α' -> 'A', 'Β' -> 'B', 'Ε' -> 'E', 'Η' -> 'H',
    'Ι' -> 'I', 'Κ' -> 'K', 'Μ' -> 'M', 'Ν' -> 'N',
    'Ο' -> 'O', 'Ρ' -> 'P', 'Τ' -> 'T',
    // Cyrillic uppercase А В Е К М Н О Р С Т Х
    'А' -> 'A', 'В' -> 'B', 'Е' -> 'E', 'К' -> 'K',
    'М' -> 'M', 'Н' -> 'H', 'О' -> 'O', 'Р' -> 'P',
    'С' -> 'C', 'Т' -> 'T', 'Х' -> 'X')

  def homoglyphSkeleton(text: Column): Column =
    translate(text, homoglyphPairs.map(_._1).mkString,
      homoglyphPairs.map(_._2).mkString)

  /** The skeleton table as (from, to) strings — exposed so oracle SQL and
    * specs replay the exact same mapping. */
  def homoglyphTable: (String, String) =
    (homoglyphPairs.map(_._1).mkString, homoglyphPairs.map(_._2).mkString)

  /** Word n-gram shingles as a distinct array — the unit for Jaccard/MinHash
    * dedup. Computed with a higher-order `transform` over an index sequence
    * (no explode/window shuffle; stays row-local). */
  def shingleArray(text: Column, n: Int): Column = {
    val ws = tokens(text)
    when(size(ws) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(ws) - n),
          i => array_join(slice(ws, i + 1, lit(n)), " "))))
  }
}
