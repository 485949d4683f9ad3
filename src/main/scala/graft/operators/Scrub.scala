package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII / identifier scrubbing for training corpora: rewrite every match of
  * a pattern catalog to a placeholder token, and count what was redacted
  * (the count column is the audit trail quality pipelines filter on —
  * "drop docs with > N redactions" is a standard contamination guard).
  *
  * Plan shape: a fold of regexp_replace / regexp_count Column expressions —
  * row-local, codegen'd, zero shuffle; at 100 TB this is a pure map over
  * the scan with nothing to tune.
  *
  * Pattern dialect contract: patterns stay inside the intersection of Java
  * regex (Spark) and RE2 (DuckDB and most oracle engines) — character
  * classes, bounded repetition, alternation; no backreferences, no
  * lookaround. That keeps every scrub rule oracle-checkable with a plain
  * `regexp_replace(..., 'g')` on the same data.
  */
object Scrub {

  /** A scrub rule: regex → replacement placeholder. */
  final case class Rule(name: String, pattern: String, replacement: String)

  /** Default catalog, most-specific first: an email must be rewritten
    * before the digit-run rule can eat its local part. */
  val email: Rule = Rule("email",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
  val ipv4: Rule = Rule("ipv4",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>")
  val digitRun: Rule = Rule("number", "[0-9]+", "<NUM>")
  val defaultRules: Seq[Rule] = Seq(email, ipv4, digitRun)

  /** The scrubbed text: rules applied in catalog order, each replacing ALL
    * its matches (Spark regexp_replace is global, like 'g' in RE2). */
  def scrubbed(text: Column, rules: Seq[Rule] = defaultRules): Column =
    rules.foldLeft(text)((c, r) => regexp_replace(c, r.pattern, r.replacement))

  /** Total matches across the catalog, counted the same way the rewrite
    * consumes them: each rule counts on the text AFTER the earlier rules
    * ran, so an email never double-counts as its embedded digit runs. */
  def redactionCount(text: Column, rules: Seq[Rule] = defaultRules): Column = {
    val (_, counts) = rules.foldLeft((text, lit(0L))) {
      case ((t, n), r) =>
        (regexp_replace(t, r.pattern, r.replacement),
          n + regexp_count(t, lit(r.pattern)).cast("long"))
    }
    counts
  }

  /** Scrub `textCol` in place and append `<textCol>_redactions`. */
  def scrub(df: DataFrame, textCol: String,
      rules: Seq[Rule] = defaultRules): DataFrame =
    df.withColumn(s"${textCol}_redactions", redactionCount(col(textCol), rules))
      .withColumn(textCol, scrubbed(col(textCol), rules))

  /** Luhn checksum over a digits-only string — the validator that
    * separates real payment-card numbers from arbitrary 13-19 digit runs
    * (a plain length regex redacts order ids and ISBNs as "cards"; the
    * checksum cuts the false-positive mass ~10×). Pure integer HOF fold
    * over the characters — row-local, no UDF — and replayable in any
    * engine with list transforms, so card-audit counts stay
    * oracle-checkable. Returns false for empty/short strings (< 13
    * digits) and null input; any non-digit character fails loudly via the
    * int cast (null → false), never silently validates. */
  def luhnValid(digits: Column): Column = {
    // Spark's split keeps a trailing empty element (Java split limit -1);
    // drop empties so chars[i] is exactly the i-th digit from the right
    val chars = reverse(filter(split(digits, ""), c => c =!= ""))
    val indexed = zip_with(chars,
      sequence(lit(0), greatest(length(digits), lit(1)) - 1),
      (ch, i) => struct(ch.as("c"), i.as("i")))
    val total = aggregate(indexed, lit(0), (acc, s) => {
      val d = s.getField("c").cast("int")
      val dd = when(s.getField("i") % 2 === 1, d * 2).otherwise(d)
      acc + when(dd > 9, dd - 9).otherwise(dd)
    })
    coalesce(length(digits) >= 13 && total % 10 === 0, lit(false))
  }
}
