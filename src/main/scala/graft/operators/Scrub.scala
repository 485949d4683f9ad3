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
}
