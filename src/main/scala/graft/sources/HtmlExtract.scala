package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML extraction (SURVEY S13 — the extraction half of
  * `crawling_code/get_coopang_best_item_id.py:11-24` /
  * `get_best_item_review.py:16-36`): the reference CSS-selects product
  * anchors and review texts out of fetched pages; browser automation
  * stays out of engine scope (SURVEY §7.5), but once pages land as a
  * string column the selector step is pure string surgery — expressed
  * here as codegen'd Column functions (regexp on RE2-compatible
  * patterns, so the same regexes run in the DuckDB oracle).
  *
  * Scale shape: every helper is a row-local narrow map over the page
  * column — no exchange, no UDF, whole-stage-codegen-friendly; a 100 TB
  * crawl corpus parses at scan speed. Regex-over-HTML caveats are the
  * reference's too (its BeautifulSoup selects are just as layout-bound);
  * the helpers aim at the extraction semantics, not an HTML5 parser. */
object HtmlExtract {

  /** All href values, in document order. */
  def links(html: Column): Column =
    regexp_extract_all(html, lit("href=\"([^\"]*)\""), lit(1))

  /** Numeric product ids from hrefs shaped `…/products/<id>` — the
    * get_coopang_best_item_id extraction. */
  def productIds(html: Column): Column =
    regexp_extract_all(html,
      lit("href=\"[^\"]*/products/([0-9]+)[^\"]*\""), lit(1))

  /** `<title>` text (first occurrence; empty string when absent). */
  def title(html: Column): Column =
    regexp_extract(html, "<title>([^<]*)</title>", 1)

  /** Texts inside elements carrying a marker CSS class (the review-text
    * select): `<tag class="…marker…">text</tag>`, nested-tag-free
    * bodies. */
  def classTexts(html: Column, cssClass: String): Column = {
    require(cssClass.matches("[A-Za-z0-9_-]+"), s"unsafe class name: $cssClass")
    regexp_extract_all(html,
      lit("<[a-z]+ class=\"[^\"]*" + cssClass + "[^\"]*\">([^<]*)</[a-z]+>"),
      lit(1))
  }

  /** Visible text: drop script/style blocks, strip all tags, decode the
    * few entities the reference's pages carry, collapse whitespace. */
  def visibleText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = regexp_replace(
      regexp_replace(
        regexp_replace(noTags, "&amp;", "&"),
        "&lt;", "<"),
      "&gt;", ">")
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
