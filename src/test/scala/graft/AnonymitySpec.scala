package graft

import graft.operators.Anonymity

/** k-anonymity / l-diversity audit: class sizes, diversity counts, gates. */
class AnonymitySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // class (us, A): 3 rows, 3 distinct sensitive values
    ("us", "A", 1), ("us", "A", 2), ("us", "A", 3),
    // class (us, B): 3 rows but a single sensitive value
    ("us", "B", 7), ("us", "B", 7), ("us", "B", 7),
    // class (de, A): singleton — the re-identifiable one
    ("de", "A", 9)).toDF("country", "segment", "wealth")

  test("class sizes, diversity counts, and both gates are exact") {
    val got = Anonymity.audit(rows, Seq("country", "segment"), "wealth",
        k = 2L, l = 2L)
      .orderBy($"country", $"segment")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === Seq(
      ("de", "A", 1L, 1L, 0L, 0L),
      ("us", "A", 3L, 3L, 1L, 1L),
      ("us", "B", 3L, 1L, 1L, 0L)))
  }

  test("gates move with k and l") {
    val strict = Anonymity.audit(rows, Seq("country", "segment"), "wealth",
        k = 4L, l = 4L).collect()
    assert(strict.forall(r => r.getLong(4) == 0L && r.getLong(5) == 0L))
  }

  test("rejects a sensitive column doubling as a quasi-identifier and bad params") {
    intercept[IllegalArgumentException] {
      Anonymity.audit(rows, Seq("country", "wealth"), "wealth", 2L, 2L)
    }
    intercept[IllegalArgumentException] {
      Anonymity.audit(rows, Seq.empty, "wealth", 2L, 2L)
    }
    intercept[IllegalArgumentException] {
      Anonymity.audit(rows, Seq("country"), "wealth", 0L, 2L)
    }
  }
}
