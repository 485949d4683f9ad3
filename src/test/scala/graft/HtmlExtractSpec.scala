package graft

import org.apache.spark.sql.functions._

import graft.sources.HtmlExtract

/** HtmlExtract (S13 extraction semantics) on hand-written pages: link
  * and product-id pulls, class-marked review selection, script/style
  * suppression in visible text, entity decoding, absent-element
  * conventions. */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def one(html: String) = Seq(Tuple1(html)).toDF("html")

  test("productIds pulls every /products/<id> href in order, other links ignored") {
    val df = one(
      """<a href="/vp/products/123?x=1">a</a>
        |<a href="/help">h</a>
        |<a href="https://s.example/vp/products/456">b</a>""".stripMargin)
    val ids = df.select(HtmlExtract.productIds($"html")).first().getSeq[String](0)
    assert(ids === Seq("123", "456"))
    val links = df.select(HtmlExtract.links($"html")).first().getSeq[String](0)
    assert(links === Seq("/vp/products/123?x=1", "/help", "https://s.example/vp/products/456"))
  }

  test("classTexts selects only the marked class, multiple occurrences in order") {
    val df = one(
      """<div class="review-text">great</div>
        |<div class="other">skip</div>
        |<span class="sdp-review review-text long">ok product</span>""".stripMargin)
    val r = df.select(HtmlExtract.classTexts($"html", "review-text"))
      .first().getSeq[String](0)
    assert(r === Seq("great", "ok product"))
    intercept[IllegalArgumentException] {
      HtmlExtract.classTexts($"html", "bad\"class")
    }
  }

  test("visibleText drops script/style bodies, strips tags, decodes entities, collapses space") {
    val df = one(
      """<html><head><title>T</title><style>p { color: red }</style>
        |<script>var leak = "SECRET";</script></head>
        |<body><p>one   &amp;
        |two</p><b>three</b></body></html>""".stripMargin)
    val text = df.select(HtmlExtract.visibleText($"html")).first().getString(0)
    assert(text === "T one & two three")
    assert(!text.contains("SECRET") && !text.contains("color"))
  }

  test("title extracts the first title; absent elements give empty/null conventions") {
    assert(one("<title>A</title><title>B</title>")
      .select(HtmlExtract.title($"html")).first().getString(0) === "A")
    assert(one("<p>no title</p>")
      .select(HtmlExtract.title($"html")).first().getString(0) === "")
    // get() is the null-safe first-element accessor (ANSI element_at
    // throws on an empty match array)
    val noIds = one("<a href=\"/help\">h</a>")
      .select(get(HtmlExtract.productIds($"html"), lit(0))).first()
    assert(noIds.isNullAt(0))
  }
}
