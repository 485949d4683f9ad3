package graft

import java.sql.Timestamp
import graft.operators.Scd2

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("no-ops merge; intervals tile half-open; last version is current") {
    val log = Seq(
      ("a", t("2024-01-01 00:00:00"), "new"),
      ("a", t("2024-01-02 00:00:00"), "new"),      // no-op snapshot
      ("a", t("2024-01-03 00:00:00"), "active"),
      ("a", t("2024-01-04 00:00:00"), "active"),   // no-op snapshot
      ("a", t("2024-01-05 00:00:00"), "closed"),
      ("b", t("2024-02-01 00:00:00"), "new"))
      .toDF("k", "ts", "status")
    val v = Scd2.versionize(log, "k", "ts", Seq("status"))
      .select($"k", $"status", $"valid_from", $"valid_to", $"is_current")
      .as[(String, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._3.getTime))
    assert(v === Seq(
      ("a", "new", t("2024-01-01 00:00:00"), Some(t("2024-01-03 00:00:00")), false),
      ("a", "active", t("2024-01-03 00:00:00"), Some(t("2024-01-05 00:00:00")), false),
      ("a", "closed", t("2024-01-05 00:00:00"), None, true),
      ("b", "new", t("2024-02-01 00:00:00"), None, true)))
  }

  test("multi-attribute tracking: any tracked column changing opens a version") {
    val log = Seq(
      ("a", t("2024-01-01 00:00:00"), "x", 1),
      ("a", t("2024-01-02 00:00:00"), "x", 2),  // second attr changes
      ("a", t("2024-01-03 00:00:00"), "x", 2))  // no-op
      .toDF("k", "ts", "s", "n")
    val v = Scd2.versionize(log, "k", "ts", Seq("s", "n"))
    assert(v.count() === 2)
    // an untracked attribute changing is a no-op
    val v2 = Scd2.versionize(log, "k", "ts", Seq("s"))
    assert(v2.count() === 1)
  }

  test("duplicate (key, ts) rows fail loudly") {
    val log = Seq(
      ("a", t("2024-01-01 00:00:00"), "x"),
      ("a", t("2024-01-01 00:00:00"), "y"))
      .toDF("k", "ts", "s")
    val e = intercept[Exception] {
      Scd2.versionize(log, "k", "ts", Seq("s")).collect()
    }
    assert(e.getMessage.contains("versionize") ||
      e.getCause != null && e.getCause.getMessage.contains("versionize"))
  }

  test("temporalLookup: each fact matches the version valid at its time") {
    val log = Seq(
      ("a", t("2024-01-01 00:00:00"), "v1"),
      ("a", t("2024-01-10 00:00:00"), "v2"),
      ("b", t("2024-01-05 00:00:00"), "w1"))
      .toDF("k", "ts", "status")
    val dim = Scd2.versionize(log, "k", "ts", Seq("status"))
    val facts = Seq(
      (1L, "a", t("2024-01-01 00:00:00")),  // inclusive valid_from
      (2L, "a", t("2024-01-09 23:59:59")),  // last instant of v1
      (3L, "a", t("2024-01-10 00:00:00")),  // exclusive boundary -> v2
      (4L, "a", t("2023-12-31 00:00:00")),  // before history -> null
      (5L, "b", t("2024-06-01 00:00:00")),  // open-ended current
      (6L, "c", t("2024-01-01 00:00:00")))  // unknown key -> null
      .toDF("fid", "k", "fts")
    val got = Scd2.temporalLookup(facts, dim, "k", "fts")
      .select($"fid", $"status").as[(Long, Option[String])]
      .collect().toMap
    assert(got === Map(1L -> Some("v1"), 2L -> Some("v1"), 3L -> Some("v2"),
      4L -> None, 5L -> Some("w1"), 6L -> None))
    // intervals tile: the join never duplicates a fact
    assert(Scd2.temporalLookup(facts, dim, "k", "fts").count() === 6L)
    // equi-join with residual, never a nested loop
    val plan = Scd2.temporalLookup(facts, dim, "k", "fts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"plan:\n$plan")
  }

  test("one shared window spec: a single exchange and a single sort") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_type")
    val plan = Scd2.versionize(ev, "user_id", "ts", Seq("event_type"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"want one exchange:\n$plan")
    val sorts = "\\bSort \\[".r.findAllIn(plan).size
    assert(sorts === 1, s"want one sort:\n$plan")
  }
}
