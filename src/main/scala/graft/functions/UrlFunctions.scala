package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation (the C4/CCNet "dedup by
  * normalized URL" preprocessing step; cf. the reference's crawl scripts,
  * crawling_code/get_coopang_best_item_id.py:11-24, which walk raw
  * product URLs).
  *
  * All helpers are pure `Column` expression trees over the built-in
  * string/regexp functions — codegen'd row-local work, no UDFs, nothing
  * ever shuffles on the raw URL. Every regex is RE2-compatible (no
  * backreferences/lookaround) so a DuckDB oracle can replay the exact
  * normalization.
  *
  * Normalization contract (deliberately minimal and deterministic):
  * lowercase → strip `#fragment` → strip `?query` (tracking params make
  * query strings dedup poison; dropping the whole query is the aggressive
  * variant CCNet uses for clustering keys) → strip `scheme://` → strip a
  * leading `www.` → strip one trailing `/`.
  */
object UrlFunctions {

  /** Canonical dedup key for a raw URL. */
  def normalizeUrl(url: Column): Column = {
    val lc = lower(url)
    val noFrag = regexp_replace(lc, "#.*$", "")
    val noQuery = regexp_replace(noFrag, "\\?.*$", "")
    val noScheme = regexp_replace(noQuery, "^[a-z][a-z0-9+.-]*://", "")
    val noWww = regexp_replace(noScheme, "^www\\.", "")
    regexp_replace(noWww, "/$", "")
  }

  /** Host part of an already-normalized URL (everything before the first
    * `/`, `:` port suffix stripped). A trailing root-label dot (FQDN form,
    * `example.com.`) is stripped too — otherwise the anchored
    * [[registeredDomain]] regex can't match and FQDN rows would silently
    * group under an empty domain key. */
  def urlHost(normalized: Column): Column =
    regexp_replace(
      regexp_replace(regexp_extract(normalized, "^([^/]*)", 1), ":[0-9]+$", ""),
      "\\.+$", "")

  /** Registered-domain heuristic: the last two dot-labels of the host
    * (`a.b.site7.example.com` → `example.com`). Public-suffix-list
    * awareness (co.uk et al.) needs an external dataset and is out of
    * scope; the two-label tail is the deterministic approximation both
    * engines can replay. Hosts without a dot (localhost) return the host
    * itself; bare-IPv4 hosts degrade to their last two octets — callers
    * grouping IP-hosted crawls should branch on a digit test first.
    * Defensive fallback: if the anchored extract yields an empty string on
    * a dotted host (degenerate forms like `.` or `a.` that survive a
    * caller skipping [[urlHost]]), the host itself is returned rather than
    * an empty group key. */
  def registeredDomain(host: Column): Column = {
    val tail = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    when(host.contains(".") && length(tail) > 0, tail).otherwise(host)
  }

  /** Path part of an already-normalized URL (empty string when absent). */
  def urlPath(normalized: Column): Column =
    regexp_extract(normalized, "^[^/]*(/.*)?$", 1)
}
