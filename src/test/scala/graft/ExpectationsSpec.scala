package graft

import org.apache.spark.sql.functions._
import graft.operators.Expectations
import graft.operators.Expectations._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixture = Seq(
    (1L, Some("en"), Some(10L)),
    (2L, Some("xx"), Some(-5L)),
    (3L, None, Some(200L)),
    (3L, Some("de"), None),
    (5L, Some("en"), Some(50L)))
    .toDF("id", "lang", "n")

  private def run(rules: Seq[Rule]) =
    Expectations.check(fixture, "id", rules)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.getString(2))))).toMap

  test("each rule counts its violations and samples the smallest offender") {
    val v = run(Seq(
      NotNull("lang"),
      AcceptedIn("lang", Seq("en", "de")),
      InRange("n", 0, 100),
      Satisfies("n_even", pmod($"n", lit(2)) === 0),
      Unique("id")))
    assert(v("not_null:lang") === ((1L, Some("3"))))
    // 'xx' and the null both fail accepted_in
    assert(v("accepted_in:lang") === ((2L, Some("2"))))
    // -5, 200, and the null n all fall outside [0, 100]
    assert(v("in_range:n") === ((3L, Some("2"))))
    // null n violates the predicate too
    assert(v("satisfies:n_even") === ((2L, Some("2"))))
    // id 3 appears twice -> both rows count
    assert(v("unique:id") === ((2L, Some("3"))))
  }

  test("a clean frame yields zero counts and null samples everywhere") {
    val clean = Seq((1L, "en", 10L), (2L, "de", 20L)).toDF("id", "lang", "n")
    val v = Expectations.check(clean, "id", Seq(
        NotNull("lang"), AcceptedIn("lang", Seq("en", "de")),
        InRange("n", 0, 100), Unique("id")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.getString(2))))).toMap
    assert(v.values.forall(_ == ((0L, None))))
  }

  test("row-local rules share one aggregate: a single scan, no per-rule jobs") {
    val plan = Expectations.check(fixture, "id", Seq(
        NotNull("lang"), InRange("n", 0, 100),
        Satisfies("p", $"n" > 0)))
      .queryExecution.executedPlan.toString
    val scans = "(LocalTableScan|Scan parquet)".r.findAllIn(plan).size
    assert(scans === 1, s"want one scan:\n$plan")
  }

  test("foreign-key rule: orphans counted, nulls exempt, clean dim passes") {
    val dim = Seq("en", "de", "fr").toDF("code")
    val v = run(Seq(ForeignKeyIn("lang", dim, "code"), NotNull("lang")))
    // id 2 ("xx") is the only orphan: id 3's null is EXEMPT from the FK
    // rule (the SQL convention) and flagged by NotNull instead
    assert(v("foreign_key:lang") === ((1L, Some("2"))))
    assert(v("not_null:lang") === ((1L, Some("3"))))
    val clean = run(Seq(ForeignKeyIn("lang",
      Seq("en", "de", "xx").toDF("code"), "code")))
    assert(clean("foreign_key:lang") === ((0L, None)))
  }

  test("duplicate rule names and empty rule lists are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.check(fixture, "id", Seq(NotNull("lang"), NotNull("lang")))
    }
    intercept[IllegalArgumentException] {
      Expectations.check(fixture, "id", Seq.empty)
    }
  }
}
