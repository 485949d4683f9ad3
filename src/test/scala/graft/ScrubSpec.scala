package graft

import graft.operators.Scrub

class ScrubSpec extends SparkSpec {

  private def one(text: String): (String, Long) = {
    import spark.implicits._
    val r = Scrub.scrub(Seq((1L, text)).toDF("id", "t"), "t").head()
    (r.getAs[String]("t"), r.getAs[Long]("t_redactions"))
  }

  test("emails are rewritten before their digits can leak into <NUM>") {
    assert(one("contact bob42@mail.example.com now") ===
      ("contact <EMAIL> now", 1L))
  }

  test("ipv4 matches whole dotted quads, not version strings") {
    assert(one("peer 10.0.42.7 timed out") === ("peer <IP> timed out", 1L))
    // 'v1.2.3' has only three octet groups: digit runs, not an IP
    assert(one("release v1.2.3") === ("release v<NUM>.<NUM>.<NUM>", 3L))
  }

  test("digit runs collapse to one placeholder each") {
    assert(one("order 12345 of 67") === ("order <NUM> of <NUM>", 2L))
  }

  test("mixed text counts every rule once, in catalog order") {
    val (scrubbed, n) =
      one("a@b.co from 192.168.0.1 at 0900")
    assert(scrubbed === "<EMAIL> from <IP> at <NUM>")
    assert(n === 3L)
  }

  test("clean text passes through untouched with a zero count") {
    assert(one("nothing to hide here") === ("nothing to hide here", 0L))
  }

  test("null text stays null") {
    import spark.implicits._
    val r = Scrub.scrub(Seq((1L, null: String)).toDF("id", "t"), "t").head()
    assert(r.getAs[String]("t") == null)
  }
}
