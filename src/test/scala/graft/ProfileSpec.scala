package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixture = Seq(
    (Some(1L), Some("a")),
    (Some(1L), Some("b")),
    (Some(2L), None),
    (None, Some("b")),
    (Some(5L), Some("a")))
    .toDF("num", "s")

  test("exact profile: counts, nulls, distincts, extremes on a hand fixture") {
    val p = Profile.profile(fixture, Seq("num", "s"), exact = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(p("num") === ((5L, 1L, 3L, "1", "5")))
    assert(p("s") === ((5L, 1L, 2L, "a", "b")))
  }

  test("approx profile: HLL distincts within rsd of exact; same frame shape") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val exact = Profile.profile(docs, Seq("doc_id", "lang"), exact = true)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profile.profile(docs, Seq("doc_id", "lang"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    exact.foreach { case (c, n) =>
      assert(math.abs(approx(c) - n) <= math.max(1L, (n * 0.1).toLong),
        s"$c: approx ${approx(c)} vs exact $n")
    }
  }

  test("HLL band holds at sf0.1 on events (the bench-scale contract, " +
      "q108's band at the sweep's data scale)") {
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.1")
    val cols = Seq("event_id", "user_id", "event_type")
    val exact = Profile.profile(ev, cols, exact = true)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Profile.profile(ev, cols)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    exact.foreach { case (c, n) =>
      assert(math.abs(approx(c) - n) <= math.max(1L, (n * 0.1).toLong),
        s"$c at sf0.1: approx ${approx(c)} vs exact $n")
    }
  }

  test("the approx plan is expansion-free; the exact plan pays Expand") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val approxPlan = Profile.profile(docs, Seq("doc_id", "lang", "source"))
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), s"approx plan expands:\n$approxPlan")
    val exactPlan = Profile.profile(docs, Seq("doc_id", "lang", "source"),
        exact = true)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"))
  }

  test("unknown columns are rejected") {
    intercept[IllegalArgumentException] {
      Profile.profile(fixture, Seq("nope"))
    }
  }
}
