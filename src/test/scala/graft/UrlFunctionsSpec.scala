package graft

import graft.functions.UrlFunctions._

class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(normalizeUrl($"u")).as[String].collect().toSeq

  private def hostDomPath(url: String): (String, String, String) = {
    val r = Seq(url).toDF("u")
      .select(normalizeUrl($"u").as("n"))
      .select(urlHost($"n").as("h"), $"n")
      .select($"h", registeredDomain($"h"), urlPath($"n"))
      .as[(String, String, String)].head()
    r
  }

  test("normalizeUrl strips scheme, www, query, fragment, trailing slash, case") {
    assert(norm(
      "HTTPS://WWW.Example.COM/a/B/?utm_source=x&id=2#frag",
      "http://example.com/a/b",
      "example.com/a/b/",
      "ftp://files.example.com/x",
      "https://example.com",
      "https://example.com/") === Seq(
      "example.com/a/b",
      "example.com/a/b",
      "example.com/a/b",
      "files.example.com/x",
      "example.com",
      "example.com"))
  }

  test("www is stripped only as a leading label; schemes only at the start") {
    assert(norm("https://wwwx.example.com/p") === Seq("wwwx.example.com/p"))
    assert(norm("https://example.com/www.deep/p") === Seq("example.com/www.deep/p"))
    // '://' later in the string is not a scheme — the anchored strip
    // leaves an embedded redirect target intact
    assert(norm("example.com/redirect=https://other.com") ===
      Seq("example.com/redirect=https://other.com"))
  }

  test("host / registered domain / path decomposition") {
    assert(hostDomPath("https://a.b.site7.Example.com:8080/p/3?x=1") ===
      ("a.b.site7.example.com", "example.com", "/p/3"))
    assert(hostDomPath("http://localhost/admin") === ("localhost", "localhost", "/admin"))
    assert(hostDomPath("https://example.org") === ("example.org", "example.org", ""))
    assert(hostDomPath("https://10.1.2.3/x") === ("10.1.2.3", "2.3", "/x"))
  }

  test("FQDN trailing dot never produces an empty domain key") {
    // example.com. (root-label form) — the trailing dot used to make the
    // anchored domain regex fail, silently grouping under ""
    assert(hostDomPath("https://example.com./p") === ("example.com", "example.com", "/p"))
    assert(hostDomPath("https://a.b.Example.COM.:443/p") ===
      ("a.b.example.com", "example.com", "/p"))
    // degenerate dotted hosts fall back to the host, never ""
    val d = Seq(".", "a.").toDF("h").select(registeredDomain($"h"))
      .as[String].collect().toSeq
    assert(d === Seq(".", "a."))
  }
}
