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

  test("luhnValid: known-good cards pass, off-by-one checksums fail") {
    import spark.implicits._
    def luhn(s: String): Boolean =
      Seq(Tuple1(s)).toDF("d")
        .select(Scrub.luhnValid(org.apache.spark.sql.functions.col("d")))
        .as[Boolean].head()
    // standard test numbers: Visa 16, Amex 15, Mastercard 16
    assert(luhn("4539148803436467"))
    assert(luhn("378282246310005"))
    assert(luhn("5555555555554444"))
    assert(!luhn("4539148803436468")) // last digit off
    assert(!luhn("4539148803436457")) // transposition
    // reference implementation agreement on every 16-digit variant of a base
    def ref(s: String): Boolean = s.reverse.zipWithIndex.map { case (c, i) =>
      val d = c - '0'
      val dd = if (i % 2 == 1) d * 2 else d
      if (dd > 9) dd - 9 else dd
    }.sum % 10 == 0
    (0 to 9).foreach { last =>
      val s = "453914880343646" + last
      assert(luhn(s) === ref(s), s)
    }
  }

  test("luhnValid: short, empty, and null inputs are false, never errors") {
    import spark.implicits._
    val got = Seq("4222222222222", "422222222222", "", null)
      .map(Tuple1(_)).toDF("d")
      .select(Scrub.luhnValid(org.apache.spark.sql.functions.col("d")).as("ok"))
      .as[Boolean].collect().toSeq
    // 13-digit Visa test number valid; 12 digits below the floor; empty/null false
    assert(got === Seq(true, false, false, false))
  }
}
